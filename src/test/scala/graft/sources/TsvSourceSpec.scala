package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DSv2 TSV connector: typed parsing, pruned-parse pushdown, charset,
  * file-level parallelism, PERMISSIVE short rows. */
class TsvSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeTsv(lines: Seq[String], charset: String = "UTF-8"): String = {
    val dir = Files.createTempDirectory("tsvsrc")
    Files.write(dir.resolve("part-0.tsv"),
      lines.mkString("\n").getBytes(charset))
    dir.toString
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("typed read matches the builtin csv reader on the same files") {
    val df = (1L to 200L).map(i => (i, s"name_$i", i * 0.5))
      .toDF("id", "name", "score")
    val dir = Files.createTempDirectory("tsvrt").toString + "/out"
    df.write.option("sep", "\t").option("header", "true").csv(dir)
    val viaBuiltin = spark.read.schema(schema)
      .option("sep", "\t").option("header", "true").csv(dir)
    val viaDsv2 = spark.read.format("graft-tsv").schema(schema)
      .option("charset", "UTF-8").load(dir)
    assert(viaDsv2.exceptAll(viaBuiltin).isEmpty &&
      viaBuiltin.exceptAll(viaDsv2).isEmpty)
  }

  test("column pruning reaches the scan: readSchema is the projected subset") {
    val dir = writeTsv(Seq("id\tname\tscore", "1\ta\t0.5", "2\tb\t1.5"))
    val df = spark.read.format("graft-tsv").schema(schema).load(dir)
      .select(col("name"))
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.nonEmpty)
    assert(scans.head.readSchema().fieldNames.toSeq === Seq("name"))
    assert(df.collect().map(_.getString(0)).sorted.toSeq === Seq("a", "b"))
  }

  test("ISO-8859-1 is the default charset (the reference's encoding)") {
    val dir = writeTsv(Seq("id\tname\tscore", "1\tcafé\t1.0"),
      charset = "ISO-8859-1")
    val out = spark.read.format("graft-tsv").schema(schema).load(dir)
      .select(col("name")).head.getString(0)
    assert(out === "café")
  }

  test("short rows read as nulls; empty cells of typed columns are null") {
    val dir = writeTsv(Seq("id\tname\tscore", "1\tonly_id", "2\t\t3.5"))
    val rows = spark.read.format("graft-tsv").schema(schema).load(dir)
      .orderBy(col("id")).collect()
    assert(rows(0).getLong(0) === 1L)
    assert(rows(0).getString(1) === "only_id")
    assert(rows(0).isNullAt(2)) // missing trailing cell
    assert(rows(1).isNullAt(1)) // empty string cell -> null
    assert(rows(1).getDouble(2) === 3.5)
  }

  test("one input partition per file; hidden files skipped") {
    val dir = Files.createTempDirectory("tsvpart")
    (0 until 3).foreach { i =>
      Files.write(dir.resolve(s"part-$i.tsv"),
        s"id\tname\tscore\n$i\tx\t1.0".getBytes(StandardCharsets.UTF_8))
    }
    Files.write(dir.resolve("_SUCCESS"), Array.emptyByteArray)
    Files.write(dir.resolve(".hidden"), "id\tname\tscore".getBytes)
    val df = spark.read.format("graft-tsv").schema(schema).load(dir.toString)
    assert(df.rdd.getNumPartitions === 3)
    assert(df.count() === 3)
  }

  test("filter pushdown: pushed predicates skip rows at parse, results unchanged") {
    val df = (1L to 500L).map(i => (i, s"name_$i", i * 0.5))
      .toDF("id", "name", "score")
    val dir = Files.createTempDirectory("tsvpush").toString + "/out"
    df.write.option("sep", "\t").option("header", "true").csv(dir)
    def read() = spark.read.format("graft-tsv").schema(schema)
      .option("charset", "UTF-8").load(dir)
    val q = read().filter(col("id") > 400L && col("score") <= 210.0 &&
      col("name") =!= "name_405")
    val viaBuiltin = spark.read.schema(schema)
      .option("sep", "\t").option("header", "true").csv(dir)
      .filter(col("id") > 400L && col("score") <= 210.0 &&
        col("name") =!= "name_405")
    assert(q.exceptAll(viaBuiltin).isEmpty && viaBuiltin.exceptAll(q).isEmpty)
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    // the supported subset (id >, score <=) is pushed and visible
    assert(scans.head.description().contains("PushedFilters"))
    assert(scans.head.description().contains("GreaterThan(id,400)"))
    // equality-In and string EqualTo also push
    val q2 = read().filter(col("name") === "name_7")
    assert(q2.count() === 1)
    val d2 = q2.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }.head
    assert(d2.contains("EqualTo(name,name_7)"))
  }

  test("statistics: optimizer sees the files' byte size") {
    val dir = Files.createTempDirectory("tsvstats")
    val payload = ("id\tname\tscore\n" +
      (1 to 50).map(i => s"$i\tn$i\t1.0").mkString("\n")).getBytes("UTF-8")
    Files.write(dir.resolve("a.tsv"), payload)
    Files.write(dir.resolve("b.tsv"), payload)
    val df = spark.read.format("graft-tsv").schema(schema).load(dir.toString)
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes === BigInt(2L * payload.length))
  }

  test("quoted fields: embedded tabs and doubled quotes parse like the builtin reader") {
    val dir = writeTsv(Seq(
      "id\tname\tscore",
      "1\t\"a\tb\"\t0.5",          // embedded tab inside quotes
      "2\t\"say \"\"hi\"\"\"\t1.5", // doubled quotes
      "3\tplain\t2.5"))
    val viaDsv2 = spark.read.format("graft-tsv").schema(schema)
      .option("charset", "UTF-8").load(dir).orderBy(col("id")).collect()
    assert(viaDsv2(0).getString(1) === "a\tb")
    assert(viaDsv2(1).getString(1) === "say \"hi\"")
    assert(viaDsv2(2).getString(1) === "plain")
  }

  test("USNVC adversarial fixture parity: graft-tsv == the reference-shaped reader") {
    // the r5 fixture row 1000011 carries a quoted field with an
    // embedded tab, doubled quotes, and ISO-8859-1 high bytes — the
    // text a real reference export can legally contain
    val dir = graft.usnvc.Fixtures.writeTo(
      Files.createTempDirectory("usnvc_tsv"))
    val s = graft.usnvc.UsnvcSchemas.unit
    val builtin = graft.usnvc.UsnvcSources.readTable(spark, "unit.txt",
      s"$dir/unit.txt")
    val dsv2 = spark.read.format("graft-tsv").schema(s).load(s"$dir/unit.txt")
    assert(dsv2.exceptAll(builtin).isEmpty && builtin.exceptAll(dsv2).isEmpty)
    assert(dsv2.count() === builtin.count() && dsv2.count() > 0)
  }

  test("schema inference: header names, all strings") {
    val dir = writeTsv(Seq("colA\tcolB", "x\ty"))
    val df = spark.read.format("graft-tsv").load(dir)
    assert(df.schema === StructType(Seq(
      StructField("colA", StringType), StructField("colB", StringType))))
    assert(df.head.getString(1) === "y")
  }

  test("header=false exposes the first line as data with _cN names") {
    val dir = writeTsv(Seq("1\ta", "2\tb"))
    val df = spark.read.format("graft-tsv").option("header", "false").load(dir)
    assert(df.schema.fieldNames.toSeq === Seq("_c0", "_c1"))
    assert(df.count() === 2)
  }

  test("write path: typed roundtrip through the connector's own writer") {
    val df = (1L to 300L).map(i =>
      (i, if (i % 7 == 0) null else s"v_$i", i * 1.5, i % 2 == 0))
      .toDF("id", "name", "score", "flag")
    val wschema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("flag", BooleanType)))
    val dir = Files.createTempDirectory("tsvwr").toString + "/out"
    df.write.format("graft-tsv").mode("overwrite")
      .option("charset", "UTF-8").save(dir)
    // no temp litter; data files only
    assert(!Files.exists(Paths.get(dir, "_temporary")) ||
      Files.list(Paths.get(dir, "_temporary")).count() === 0)
    val back = spark.read.format("graft-tsv").schema(wschema)
      .option("charset", "UTF-8").load(dir)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("write path: QUOTE_MINIMAL encoding survives its own reader and the builtin") {
    val df = Seq(
      (1L, "tab\there", 1.0), (2L, "say \"hi\"", 2.0), (3L, "plain", 3.0))
      .toDF("id", "name", "score")
    val dir = Files.createTempDirectory("tsvwq").toString + "/out"
    df.write.format("graft-tsv").mode("overwrite")
      .option("charset", "UTF-8").save(dir)
    val back = spark.read.format("graft-tsv").schema(schema)
      .option("charset", "UTF-8").load(dir)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    val builtin = spark.read.schema(schema)
      .option("sep", "\t").option("header", "true").option("escape", "\"")
      .csv(dir)
    assert(builtin.exceptAll(df).isEmpty && df.exceptAll(builtin).isEmpty)
  }

  test("write path: overwrite truncates previous contents") {
    val dir = Files.createTempDirectory("tsvow").toString + "/out"
    def w(lo: Long, hi: Long) = (lo to hi).map(i => (i, s"n$i", 1.0))
      .toDF("id", "name", "score")
      .write.format("graft-tsv").mode("overwrite")
      .option("charset", "UTF-8").save(dir)
    w(1, 100)
    w(200, 250)
    val back = spark.read.format("graft-tsv").schema(schema)
      .option("charset", "UTF-8").load(dir)
    assert(back.count() === 51)
    assert(back.agg(min(col("id"))).head.getLong(0) === 200L)
  }

  test("empty directory is refused loudly") {
    val dir = Files.createTempDirectory("tsvempty").toString
    intercept[IllegalArgumentException] {
      spark.read.format("graft-tsv").load(dir)
    }
  }

  test("recursive listing: partitioned subdirectories read completely") {
    val root = Files.createTempDirectory("tsvrec")
    Files.createDirectories(root.resolve("lang=en"))
    Files.createDirectories(root.resolve("lang=de/deep"))
    Files.createDirectories(root.resolve("_hidden")) // must be skipped
    Files.write(root.resolve("lang=en/part-0.tsv"),
      "id\tname\tscore\n1\ta\t0.5\n".getBytes(StandardCharsets.UTF_8))
    Files.write(root.resolve("lang=de/deep/part-0.tsv"),
      "id\tname\tscore\n2\tb\t1.5\n".getBytes(StandardCharsets.UTF_8))
    Files.write(root.resolve("_hidden/part-0.tsv"),
      "id\tname\tscore\n99\tx\t9.9\n".getBytes(StandardCharsets.UTF_8))
    val df = spark.read.format("graft-tsv").schema(schema)
      .option("charset", "UTF-8").load(root.toString)
    assert(df.select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 2L))
  }

  test("write->read keeps empty string distinct from null") {
    val df = Seq((1L, ""), (2L, null: String), (3L, "v"))
      .toDF("id", "name")
    val wschema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val dir = Files.createTempDirectory("tsvnull").toString + "/out"
    df.write.format("graft-tsv").mode("overwrite")
      .option("charset", "UTF-8").save(dir)
    val back = spark.read.format("graft-tsv").schema(wschema)
      .option("charset", "UTF-8").load(dir)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) "<null>" else r.getString(1)))
      .toMap
    assert(back === Map(1L -> "", 2L -> "<null>", 3L -> "v"))
  }

  test("custom nullValue: a real cell equal to it survives the roundtrip") {
    val df = Seq((1L, "NA"), (2L, null: String)).toDF("id", "name")
    val wschema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val dir = Files.createTempDirectory("tsvna").toString + "/out"
    df.write.format("graft-tsv").mode("overwrite")
      .option("charset", "UTF-8").option("nullValue", "NA").save(dir)
    val back = spark.read.format("graft-tsv").schema(wschema)
      .option("charset", "UTF-8").option("nullValue", "NA").load(dir)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) "<null>" else r.getString(1)))
      .toMap
    assert(back === Map(1L -> "NA", 2L -> "<null>"))
  }

  test("commit writes the stats sidecar; scan serves rows+bytes from it") {
    val df = (1L to 500L).map(i => (i, s"n$i", i * 0.5))
      .toDF("id", "name", "score").repartition(8) // many-file commit
    val dir = Files.createTempDirectory("tsvstats").toString + "/out"
    df.write.format("graft-tsv").mode("overwrite")
      .option("charset", "UTF-8").save(dir)
    val conf = spark.sessionState.newHadoopConf()
    val stats = TsvStatsSidecar.read(dir, conf)
    assert(stats.isDefined)
    assert(stats.get.rows === 500L)
    assert(stats.get.files === TsvSource.listFiles(dir, conf).length)
    assert(stats.get.bytes > 0)
    // the scan's reported statistics carry the committed numRows
    val scan = new TsvScan(schema, schema, Array.empty,
      TsvOptions(dir, "UTF-8", header = true, ""))
    val est = scan.estimateStatistics()
    assert(est.numRows().getAsLong === 500L)
    assert(est.sizeInBytes().getAsLong === stats.get.bytes)
    // staleness guard: an extra file invalidates the sidecar
    Files.write(Paths.get(dir, "extra.tsv"),
      "id\tname\tscore\n9\tx\t0.1\n".getBytes(StandardCharsets.UTF_8))
    val est2 = new TsvScan(schema, schema, Array.empty,
      TsvOptions(dir, "UTF-8", header = true, "")).estimateStatistics()
    assert(!est2.numRows().isPresent)
  }

  test("commit with an unrenameable temp file fails loudly") {
    val dir = Files.createTempDirectory("tsvfail").toString + "/out"
    Files.createDirectories(Paths.get(dir))
    val write = new TsvWrite(schema,
      TsvOptions(dir, "UTF-8", header = true, ""), truncateFirst = false)
    intercept[java.io.IOException] {
      write.commit(Array(
        TsvCommitMessage(s"$dir/_temporary/nonexistent.tsv-x",
          "part-00000-0.tsv", 1L, 10L)))
    }
  }
}
