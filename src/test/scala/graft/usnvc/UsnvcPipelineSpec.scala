package graft.usnvc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end pipeline assertions on the synthetic fixture export,
  * pinning the reference quirks documented in DocAssembly's Scaladoc
  * (entity-chain unescape, "nan" parent string, raw nation tokens,
  * nearest-first ancestors, [0] root fallback, null-key omission). */
class UsnvcPipelineSpec extends SparkSpec {

  private lazy val dir =
    Fixtures.writeTo(java.nio.file.Files.createTempDirectory("usnvc_fixture"))
  private lazy val ctx = Preprocess(spark, dir)
  private lazy val docs = UsnvcPipeline
    .docsJson(spark, dir, UsnvcPipeline.Config(clock = "2018-03-01T00:00:00"))
    .collect().map(r => r.getString(1) -> r.getString(0)).toMap

  private def doc(id: String): String = docs(id)

  test("emits root + one doc per unit") {
    assert(docs.size == 18) // 17 units + synthetic root
  }

  test("root doc: title, children = parentless units, unitsort '0'") {
    val root = doc("0")
    assert(root.contains("\"title\":\"US National Vegetation Classification\""))
    assert(root.contains("\"children\":[1000001,1000006]"))
    assert(root.contains("\"unitsort\":\"0\""))
    assert(root.contains("\"id\":\"0\""))
    assert(!root.contains("\"parent\"")) // null → key omitted
  }

  test("display title branches: Class / Macrogroup / Association") {
    assert(doc("1000001").contains("\"Display Title\":\"1 Forest Class\""))
    assert(doc("1000003").contains("\"Display Title\":\"M1 Maple Forest\""))
    assert(doc("1000005").contains("\"Display Title\":\"CEGL001 Red Maple Swamp Forest\""))
  }

  test("clean_string chains &amp; first → &amp;lt; double-unescapes") {
    assert(doc("1000001").contains("\"Type Concept\":\"Trees <tall> & shrubs\""))
    assert(doc("1000001").contains("\"Type Concept Sentence\":\"Trees & shrubs.\""))
  }

  test("ancestors nearest-first; roots default to [0]") {
    assert(doc("1000005").contains(
      "\"ancestors\":[1000004,1000003,1000002,1000001]"))
    assert(doc("1000001").contains("\"ancestors\":[0]"))
  }

  test("parent long with 0 fallback; Hierarchy.parent_id 'nan' quirk") {
    assert(doc("1000005").contains("\"parent\":1000004"))
    assert(doc("1000001").contains("\"parent\":0"))
    assert(doc("1000001").contains("\"parent_id\":\"nan\""))
    assert(doc("1000002").contains("\"parent_id\":\"1000001\""))
  }

  test("children collected; leaves get []") {
    assert(doc("1000001").contains("\"children\":[1000002,1000008]"))
    assert(doc("1000005").contains("\"children\":[]"))
  }

  test("display title: colloquial branch at Subclass/Formation; otherwise-branch at Alliance + cultural depth") {
    assert(doc("1000008").contains("\"Display Title\":\"1.B Shade Forest Subclass\""))
    assert(doc("1000009").contains("\"Display Title\":\"1.B.1 Humid Forest Formation\""))
    // Alliance + cultural levels fall to databasecode + translated
    assert(doc("1000010").contains("\"Display Title\":\"A0100 Red Maple Alliance\""))
    assert(doc("1000017").contains("\"Display Title\":\"CST01 Annual Pivot Corn Subtype\""))
  }

  test("max-depth cultural chain: ancestors nearest-first to the cultural root") {
    assert(doc("1000017").contains("\"ancestors\":[1000016,1000015,1000014," +
      "1000013,1000012,1000007,1000006]"))
  }

  test("adversarial TSV: embedded tab and doubled quote survive quote-aware parsing") {
    val d = doc("1000011")
    // scientificname had a doubled quote inside a quoted field
    assert(d.contains("\"Scientific Name\":\"Acer \\\"rubrum\\\" swampensis\""))
    // colloquialname had an embedded tab (JSON-encoded as \t)
    assert(d.contains("\"Colloquial Name\":\"Tab\\there\""))
    // entity chain inside a quoted field still double-unescapes
    assert(d.contains("\"Type Concept Sentence\":\"Quotes \\\"inside\\\" & tabs\\there.\""))
    assert(d.contains("\"Type Concept\":\"Deep <nest>\""))
    // ISO-8859-1 high bytes in the quoted translated name
    assert(d.contains("Forêt"))
  }

  test("sparse-weird description: independent presence predicates fire alone") {
    val d = doc("1000017")
    assert(d.contains("\"Omernik Ecoregions\":4"))
    assert(!d.contains("\"TNC Ecoregions\""))
    assert(!d.contains("\"Federal Lands\""))
    assert(d.contains("2015-02-03"))
  }

  test("cached hierarchy = ancestors + self + children with titles") {
    val d = doc("1000004")
    // 3 ancestors + self + 1 child = 5 records
    assert(d.split("\"Display Title\"").length >= 6) // 5 in cache + 1 in Overview
    assert(d.contains("\"unitsort\":\"1.A.M1.G1\""))
  }

  test("nations: raw-token abbreviation, '?' uncertainty, offline names") {
    val d = doc("1000001")
    assert(d.contains("\"Raw List\":\"US, CA?, XX\""))
    assert(d.contains(
      "{\"Abbreviation\":\"US\",\"Uncertainty\":false," +
        "\"Info API\":\"https://restcountries.eu/rest/v2/alpha/US\"," +
        "\"Name\":\"United States of America\"}"))
    // raw token " CA?" (reference keeps it): uncertainty true, unresolvable
    assert(d.contains("\"Abbreviation\":\" CA?\",\"Uncertainty\":true"))
    assert(d.contains("\"Abbreviation\":\" XX\",\"Uncertainty\":false," +
      "\"Info API\":\"https://restcountries.eu/rest/v2/alpha/ XX\",\"Name\":\"Unknown\""))
  }

  test("references nested as Short/Full Citation pairs; absent → []") {
    val d = doc("1000001")
    assert(d.contains("\"Short Citation\":\"Jones 1995\""))
    assert(d.contains("\"Short Citation\":\"Smith 1990\""))
    assert(doc("1000005").contains("\"References\":[]"))
  }

  test("confidence dim joined; int-gated fields omitted when null") {
    assert(doc("1000001").contains("\"Confidence Level\":\"High\""))
    assert(doc("1000003").contains("\"Confidence Level\":\"Moderate\""))
    assert(doc("1000001").contains("\"TNC Ecoregions\":42"))
    assert(!doc("1000005").contains("\"TNC Ecoregions\""))
    assert(!doc("1000001").contains("\"Omernik Ecoregions\"")) // empty cell
    assert(doc("1000001").contains("\"Federal Lands\":7"))
  }

  test("detail tables nested per unit with both-case join keys") {
    val d = doc("1000005")
    assert(d.contains("\"States/Provinces Raw Data\""))
    assert(d.contains("\"d_curr_presence_absence_id\":\"1\""))
    assert(d.contains("\"D_CURR_PRESENCE_ABSENCE_ID\":\"1\""))
    assert(d.contains("\"subnation_name\":\"Massachusetts\""))
    assert(d.contains("\"1994 USFS Ecoregion Raw Data\""))
    assert(d.contains("\"USFS_ECOREGION_NAME\":\"Adirondack\""))
    assert(d.contains("\"2007 USFS Ecoregion Raw Data\""))
    assert(d.contains("\"Predecessors Raw Data\""))
    assert(d.contains("\"Obsolete Units Raw Data\""))
    assert(d.contains("\"Obsolete Parents Raw Data\""))
    assert(d.contains("\"Similar NVC Types\""))
    assert(d.contains("\"simnote\":\"Similar &amp; related\"")) // raw, not cleaned
  }

  test("ISO-8859-1 text survives (accented char)") {
    assert(doc("1000007").contains("herbacée"))
  }

  test("injected clock stamped on every unit doc") {
    assert(doc("1000005").contains("\"Date Processed\":\"2018-03-01T00:00:00\""))
  }

  test("validation: fixture docs all pass the final-result contract") {
    val v = UsnvcPipeline.validated(
      UsnvcPipeline.docsJson(spark, dir))
    assert(v.filter(col("error").isNotNull).count() == 0)
  }

  test("ledger: one Initialize per unit + one Process per doc") {
    val l = UsnvcPipeline.ledger(spark, dir)
    assert(l.filter(col("change_name") === "Initialize").count() == 17)
    assert(l.filter(col("change_name") === "Process").count() == 17)
  }

  test("ledger events carry the reference's full field set incl. result") {
    // log_change_event(id, name, desc, fn, source, result), usnvc.py:55-57,74-77:
    // Initialize logs source={} and the unit row as result; Process logs
    // the row payload as source and the assembled doc as result.
    val l = UsnvcPipeline.ledger(spark, dir).cache()
    assert(l.columns.toSeq == Seq("change_id", "change_name",
      "change_description", "function_name", "source", "result"))
    val init = l.filter(col("change_name") === "Initialize" &&
      col("change_id") === "1000005").collect().head
    assert(init.getAs[String]("source") == "{}")
    assert(init.getAs[String]("result").contains("\"element_global_id\":\"1000005\""))
    val proc = l.filter(col("change_name") === "Process" &&
      col("change_id") === "1000005").collect().head
    assert(proc.getAs[String]("source").contains("\"element_global_id\":\"1000005\""))
    assert(proc.getAs[String]("result").contains("\"Identifiers\""))
    l.unpersist()
  }

  test("limit config mirrors the reference debug truncation") {
    val limited = UsnvcPipeline.docsJson(spark, dir,
      UsnvcPipeline.Config(limit = Some(3)))
    assert(limited.count() == 4) // root + 3
  }

  test("golden docs: byte-identical JSON for the full fixture corpus") {
    // Locks the entire output surface (field order, null omission,
    // nesting, quirks) — the assembly is deterministic, so raw string
    // equality is valid and the strictest possible check.
    val goldenLines = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/usnvc/golden_docs.jsonl"), "UTF-8")
      .getLines().filter(_.nonEmpty).toSeq
    def key(j: String): String = {
      val m = """"row_id":"(\d+)"""".r.findFirstMatchIn(j)
      m.get.group(1)
    }
    val golden = goldenLines.map(l => key(l) -> l).toMap
    assert(golden.keySet == docs.keySet)
    golden.foreach { case (id, expected) =>
      assert(docs(id) == expected, s"doc $id drifted from golden")
    }
  }

  test("run() writes docs + empty error sidecar to disk") {
    val out = java.nio.file.Files.createTempDirectory("usnvc_out").toString
    UsnvcPipeline.run(spark, dir, out)
    val written = spark.read.text(s"$out/docs").count()
    assert(written == 18)
    assert(new java.io.File(s"$out/errors").exists())
  }

  test("incremental foreachBatch processes newly-announced export dirs") {
    val root = java.nio.file.Files.createTempDirectory("usnvc_inc")
    val triggers = root.resolve("triggers"); val out = root.resolve("out")
    java.nio.file.Files.createDirectories(triggers)
    java.nio.file.Files.writeString(triggers.resolve("batch1.txt"), dir + "\n")
    UsnvcPipeline.incremental(spark, triggers.toString, out.toString,
      root.resolve("ckpt").toString)
    val name = new java.io.File(dir).getName
    assert(spark.read.text(s"$out/$name/docs").count() == 18)
  }

  test("preprocess plans broadcast every dimension join") {
    val plan = ctx.nvcsDistribution.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("malformed TSV rows read permissively (short rows → nulls)") {
    val bad = java.nio.file.Files.createTempDirectory("usnvc_bad")
    Fixtures.writeTo(bad)
    // truncate one unit row to 3 of 14 columns
    val unitPath = bad.resolve("unit.txt")
    val latin1 = java.nio.charset.Charset.forName("ISO-8859-1")
    val lines = java.nio.file.Files.readAllLines(unitPath, latin1)
    lines.set(3, "1000099\t1000001\t1")
    java.nio.file.Files.write(unitPath, lines, latin1)
    val units = Preprocess(spark, bad.toString).nvcsUnits
    val row = units.filter(org.apache.spark.sql.functions
      .col("element_global_id") === "1000099").collect()
    assert(row.length == 1)
    assert(row.head.getAs[String]("databasecode") == null)
  }

  test("preprocess frame shapes match the reference joins") {
    assert(ctx.nvcsUnits.count() == 17)
    assert(ctx.unitReferences.count() == 3)
    assert(ctx.nvcsDistribution.count() == 2)
    assert(ctx.usfsEcoregionDistribution1994.count() == 1)
    assert(ctx.usfsEcoregionDistribution2007.count() == 1)
  }
}
