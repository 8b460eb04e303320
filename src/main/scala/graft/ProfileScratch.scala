package graft

import graft.operators.{Dedup, Hierarchy}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiling + scale-smoke harness (dev tool, not part of
  * the driver contract). Run with SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS:
  *
  *   sbt "runMain graft.ProfileScratch [dedup|closure|hashtax]"
  */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val what = args.headOption.getOrElse("dedup")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    what match {
      case "dedup" =>
        val docs = Tables.documents(spark, d)
        docs.count() // warm scan
        t("full q19 capped ngram")(
          queries.DedupQueries.ngramJaccard(spark, d).count())
        t("full q20 minhash portable")(
          queries.DedupQueries.minHashLsh(spark, d).count())
        t("full q21 simhash portable")(
          queries.DedupQueries.simHash(spark, d).count())

      case "hashtax" =>
        // quantify the portable-hash (md5-derived) tax vs xxhash64 fast
        // mode on the full MinHash+LSH pipeline at sf0.1
        val docs = Tables.documents(spark, d)
        docs.count()
        t("minHashPairs PORTABLE (oracle mode)")(
          Dedup.minHashPairs(docs, "doc_id", "text",
            shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.5,
            seed = 42L, portable = true).count())
        t("minHashPairs FAST (xxhash64, 100TB mode)")(
          Dedup.minHashPairs(docs, "doc_id", "text",
            shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.5,
            seed = 42L, portable = false).count())
        t("simHashPairs PORTABLE")(
          Dedup.simHashPairs(docs, "doc_id", "text",
            shingleN = 3, maxHamming = 3, portable = true).count())
        t("simHashPairs FAST")(
          Dedup.simHashPairs(docs, "doc_id", "text",
            shingleN = 3, maxHamming = 3, portable = false).count())

      case "dedup10x" =>
        // MinHash+LSH scaling check: 10× the sf0.1 corpus (50k docs)
        // via id-offset self-union. Linear-ish growth here means the
        // banded-candidate path holds; super-linear growth would mean
        // a hot bucket (the quadratic term) is back.
        val base = Tables.documents(spark, d)
          .select(col("doc_id"), col("text"))
        val docs10 = (0 until 10).map(i =>
          base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
            col("text"))).reduce(_ union _)
          .repartition(32).persist()
        println(s"  corpus: ${docs10.count()} docs")
        t("minhash+LSH FAST at 10x sf0.1") {
          Dedup.minHashPairs(docs10, "doc_id", "text",
            shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.5,
            seed = 42L, portable = false).count()
        }
        t("simhash FAST at 10x sf0.1") {
          Dedup.simHashPairs(docs10, "doc_id", "text",
            shingleN = 3, maxHamming = 3, portable = false).count()
        }

      case "components" =>
        // Connected-components scale smoke: 1M edges over 500k nodes in
        // two shapes — near-dup-like (250k tiny cliques: diameter 1-2,
        // plain propagation's home turf) and adversarial (one 200k-node
        // chain: star contraction's reason to exist).
        import graft.operators.Components
        val cliques = spark.range(0, 1000000).select(
          (col("id") / 4).cast("long").as("a"),
          ((col("id") / 4).cast("long") * 4 + pmod(col("id"), lit(4))
            + lit(250000L)).as("b"))
          .repartition(32)
        cliques.persist().count()
        val c1 = t("propagation: 1M-edge clique soup") {
          Components.connectedComponents(cliques, "a", "b").count()
        }
        println(s"  labelled nodes: $c1")
        val c2 = t("star contraction: 1M-edge clique soup") {
          Components.connectedComponentsStar(cliques, "a", "b").count()
        }
        println(s"  labelled nodes: $c2")
        val chain = spark.range(1, 200000)
          .select(col("id").as("a"), (col("id") + 1).as("b"))
          .repartition(32)
        chain.persist().count()
        val c3 = t("star contraction: 200k-node chain (diameter 200k)") {
          Components.connectedComponentsStar(chain, "a", "b").count()
        }
        println(s"  labelled nodes: $c3 (propagation would need 200k rounds)")

      case "query" =>
        // Generic single-query profiler: warmup at sf0.001, then two
        // timed noop-sink runs at $SPARK_GRAFT_SF_DIR.
        val name = args(1)
        val fn = SparkEntry.queries(name)
        def run(dir: String): Unit =
          fn(spark, dir).write.format("noop").mode("overwrite").save()
        t(s"$name warmup sf0.001")(run("/root/testdata/sf0.001"))
        t(s"$name @$d run1")(run(d))
        t(s"$name @$d run2")(run(d))

      case "closure" =>
        // USNVC-shaped scale smoke: 100k units in 6 250 chains of depth
        // 16 (the reference taxonomy's max depth). Pins closure
        // wall-time and proves plan size stays linear in depth.
        import spark.implicits._
        val n = 100000L
        val chains = 6250L // n / 16 -> depth-16 chains
        val nodes = spark.range(1, n + 1).select(
          col("id"),
          when(col("id") <= chains, lit(null).cast("long"))
            .otherwise(col("id") - chains).as("parent"))
          .repartition(32)
        nodes.persist().count()
        val closure = t("iterative closure 100k nodes depth 16") {
          val c = Hierarchy.ancestorClosure(nodes, "id", "parent",
            maxDepth = 32, broadcastEdges = true)
          c.count()
        }
        println(s"  closure rows: $closure (expect ${chains * 16 * 15 / 2})")
        val paths = t("ancestorPaths fold") {
          Hierarchy.ancestorPaths(nodes, "id", "parent", 32).count()
        }
        println(s"  nodes with ancestors: $paths (expect ${n - chains})")
        t("recursive-CTE closure 100k nodes") {
          Hierarchy.ancestorClosureSql(nodes, "id", "parent", 32).count()
        }
    }
    spark.stop()
  }
}
