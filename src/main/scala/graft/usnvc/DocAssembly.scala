package graft.usnvc

import graft.operators.Hierarchy
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single-pass assembly of the nested USNVC unit documents — the Spark
  * re-expression of `process_usnvc` (`usnvc.py:238-490`), which the
  * reference runs once per unit against a per-invocation re-scan.
  *
  * Set-oriented rewrites (SURVEY §2.2 P4 → §2.3 J11): each per-unit
  * point lookup becomes one pre-aggregated `collect_list(struct)` per
  * detail table plus a left join — 7 keyed shuffles total instead of
  * O(units) linear scans. The per-row ancestor `while` loop
  * (`usnvc.py:508-515`) becomes the iterative closure in
  * [[graft.operators.Hierarchy]].
  *
  * Fidelity notes (quirks reproduced or documented):
  *  - `clean_string` (`usnvc.py:493-497`) replaces `&amp;` FIRST, so
  *    `&amp;lt;` double-unescapes to `<` — same chained order here.
  *  - `Hierarchy.parent_id` is `str(row['parent_id'])`, which renders
  *    root NaN as the literal string "nan" (`usnvc.py:430`) — kept.
  *  - `Nation Info.Abbreviation` carries the RAW token (the stripped
  *    version built at `usnvc.py:359` is discarded at `:366`), so
  *    codes with `?` or leading spaces don't resolve — kept; lookup
  *    is the offline [[PlaceCodes]] broadcast map, not per-row REST.
  *  - Detail/children arrays are deterministically ordered (structs
  *    sorted; children by unitsort) where the reference used input
  *    file order — a documented divergence, required for reproducible
  *    output at scale.
  *  - `Date Processed` is an injected clock (`usnvc.py:285` stamps
  *    per-row wall time, untestable and nondeterministic).
  */
object DocAssembly {

  /** F1 (`usnvc.py:493-497`): sequential whole-string entity unescape;
    * order matters (`&amp;` first). */
  def cleanString(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&amp;", "&"), "&lt;", "<"), "&gt;", ">")

  /** F2 (`usnvc.py:324-332`, duplicated `519-527`): 3-branch display
    * title. Null-propagating concat (the reference would throw on a
    * null operand; we yield null). */
  def displayTitle(
      level: Column, classificationCode: Column, databaseCode: Column,
      translated: Column, colloquial: Column): Column =
    when(level.isin("Class", "Subclass", "Formation", "Division"),
      concat(classificationCode, lit(" "), colloquial, lit(" "), level))
      .when(level.isin("Macrogroup", "Group"),
        concat(classificationCode, lit(" "), translated))
      .otherwise(concat(databaseCode, lit(" "), translated))

  private val hierCols = Seq("element_global_id", "parent_id",
    "hierarchylevel", "classificationcode", "databasecode",
    "translatedname", "colloquialname", "unitsort", "DISPLAY_ORDER")

  /** The 9-column hierarchy record + Display Title, as carried in
    * `Cached Hierarchy` (`usnvc.py:502-528`). */
  private def hierStruct(qual: String => Column): Column =
    struct(
      (hierCols.map(c => qual(c).as(c)) :+
        displayTitle(qual("hierarchylevel"), qual("classificationcode"),
          qual("databasecode"), qual("translatedname"),
          qual("colloquialname")).as("Display Title")): _*)

  /** Per-unit hierarchy snapshot (H1–H3, `usnvc.py:500-530`):
    * (element_global_id, ancestors: Array[Long] nearest-first,
    * children: Array[Long], cached: ancestors ++ self ++ children with
    * Display Titles). */
  def hierarchySnapshot(units: DataFrame): DataFrame = {
    val slice = units.select(hierCols.map(col): _*)

    // Ancestor closure: (id, ancestor, depth), depth 1 = parent.
    val closure = Hierarchy.ancestorClosure(slice, "element_global_id", "parent_id")
    val ancRecords = closure.alias("c")
      .join(slice.alias("a"), col("c.ancestor") === col("a.element_global_id"))
      .groupBy(col("c.id").as("element_global_id"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("c.depth").as("depth"),
            hierStruct(n => col(s"a.$n")).as("rec")))),
          x => x.getField("rec")).as("anc_records"),
        transform(
          array_sort(collect_list(struct(col("c.depth").as("depth"),
            col("a.element_global_id").cast("long").as("aid")))),
          x => x.getField("aid")).as("anc_ids"))

    // Children ordered by unitsort (reference: input file order).
    val childRecords = slice.alias("ch")
      .filter(col("ch.parent_id").isNotNull)
      .groupBy(col("ch.parent_id").as("element_global_id"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("ch.unitsort").as("k"),
            hierStruct(n => col(s"ch.$n")).as("rec")))),
          x => x.getField("rec")).as("child_records"),
        transform(
          array_sort(collect_list(struct(col("ch.unitsort").as("k"),
            col("ch.element_global_id").cast("long").as("cid")))),
          x => x.getField("cid")).as("child_ids"))

    slice.select(col("element_global_id"), hierStruct(col).as("self_rec"))
      .join(ancRecords, Seq("element_global_id"), "left")
      .join(childRecords, Seq("element_global_id"), "left")
      .select(
        col("element_global_id"),
        coalesce(col("anc_ids"), array()).as("ancestors"),
        coalesce(col("child_ids"), array()).as("children"),
        concat(
          coalesce(col("anc_records"), array()),
          array(col("self_rec")),
          coalesce(col("child_records"), array())).as("cached_hierarchy"))
  }

  /** All detail tables pre-aggregated to per-unit struct arrays (J11):
    * one left join each instead of the reference's per-unit scans
    * (`usnvc.py:318-488`). Arrays are struct-sorted for determinism.
    * Columns are positionally uniquified first: the merged frames carry
    * case-twin keys (e.g. `d_curr_presence_absence_id` and
    * `D_CURR_PRESENCE_ABSENCE_ID`), which Spark's case-insensitive
    * resolver would otherwise reject — both must survive into the
    * output structs for doc fidelity (SURVEY §2.3). */
  private def nested(df: DataFrame, outCol: String): DataFrame = {
    val names = df.columns
    val tmp = df.toDF(names.indices.map(i => s"__c$i"): _*)
    val keyIdx = names.indexWhere(_.equalsIgnoreCase("element_global_id"))
    tmp.groupBy(col(s"__c$keyIdx").as("element_global_id"))
      .agg(array_sort(collect_list(struct(
        names.indices.map(i => col(s"__c$i").as(names(i))): _*))).as(outCol))
  }

  /** Nation Info entries (F3 + S5, `usnvc.py:355-366,536-553`): raw
    * token kept as Abbreviation (reference discards the stripped one),
    * Uncertainty from trailing '?', offline name lookup. */
  private def nationInfo(nations: Column): Column = {
    val names = typedlit(PlaceCodes.codeToName)
    transform(split(nations, ","), tok => struct(
      tok.as("Abbreviation"),
      tok.endsWith("?").as("Uncertainty"),
      concat(lit("https://restcountries.eu/rest/v2/alpha/"), tok).as("Info API"),
      coalesce(element_at(names, tok), lit("Unknown")).as("Name")))
  }

  /** Full unit documents: one row per unit, columns
    * (source_data: nested struct, row_id: string).
    * `clock` is the injected `Date Processed` value (F7). */
  def unitDocs(ctx: UsnvcContext, clock: String): DataFrame = {
    val u = ctx.nvcsUnits
    val details = u
      .join(nested(ctx.unitXSimilarUnit, "similar_units"), Seq("element_global_id"), "left")
      .join(nested(ctx.nvcsDistribution, "dist_records"), Seq("element_global_id"), "left")
      .join(nested(ctx.usfsEcoregionDistribution1994, "eco94_records"), Seq("element_global_id"), "left")
      .join(nested(ctx.usfsEcoregionDistribution2007, "eco07_records"), Seq("element_global_id"), "left")
      .join(nested(ctx.unitPredecessors, "predecessor_records"), Seq("element_global_id"), "left")
      .join(nested(ctx.obsoleteUnits, "obsolete_unit_records"), Seq("element_global_id"), "left")
      .join(nested(ctx.obsoleteParents, "obsolete_parent_records"), Seq("element_global_id"), "left")
      .join(ctx.unitReferences
          .groupBy(col("element_global_id"))
          .agg(array_sort(collect_list(struct(
            col("shortcitation").as("Short Citation"),
            col("fullcitation").as("Full Citation")))).as("reference_records")),
        Seq("element_global_id"), "left")
      .join(hierarchySnapshot(u), Seq("element_global_id"), "left")

    def s(name: String): Column = col(name)
    def cleaned(name: String): Column = cleanString(s(name))
    val title = displayTitle(s("hierarchylevel"), s("classificationcode"),
      s("databasecode"), s("translatedname"), s("colloquialname"))

    val sourceData = struct(
      struct(
        s("element_global_id").cast("long").as("element_global_id"),
        s("databasecode").as("Database Code"),
        s("classificationcode").as("Classification Code")).as("Identifiers"),
      struct(
        s("scientificname").as("Scientific Name"),
        cleaned("formattedscientificname").as("Formatted Scientific Name"),
        s("translatedname").as("Translated Name"),
        s("colloquialname").as("Colloquial Name"),
        cleaned("typeconceptsentence").as("Type Concept Sentence"),
        cleaned("typeconcept").as("Type Concept"),
        cleaned("diagnosticcharacteristics").as("Diagnostic Characteristics"),
        cleaned("rationale").as("Rationale for Nonimal Species or Physiognomic Features"),
        cleaned("classificationcomments").as("Classification Comments"),
        cleaned("othercomments").as("Other Comments"),
        cleaned("similarnvctypescomments").as("Similar NVC Type Comments"),
        s("similar_units").as("Similar NVC Types"),
        title.as("Display Title")).as("Overview"),
      struct(
        cleaned("physiognomy").as("Physiognomy and Structure"),
        cleaned("floristics").as("Floristics"),
        cleaned("dynamics").as("Dynamics")).as("Vegetation"),
      struct(
        cleaned("environment").as("Environmental Description"),
        cleaned("spatialpattern").as("Spatial Pattern")).as("Environment"),
      struct(
        s("range").as("Geographic Range"),
        when(s("nations").isNotNull, struct(
          s("nations").as("Raw List"),
          nationInfo(s("nations")).as("Nation Info"))).as("Nations"),
        when(s("subnations").isNotNull,
          struct(s("subnations").as("Raw List"))).as("Subnations"),
        s("dist_records").as("States/Provinces Raw Data"),
        s("eco94_records").as("1994 USFS Ecoregion Raw Data"),
        s("eco07_records").as("2007 USFS Ecoregion Raw Data"),
        s("tncecoregions").as("TNC Ecoregions"),
        s("omernikecoregions").as("Omernik Ecoregions"),
        s("federallands").as("Federal Lands")).as("Distribution"),
      struct(
        s("plotcount").as("Plot Count"),
        s("plotsummary").as("Plot Summary"),
        s("plottypal").as("Plot Type"),
        s("plotarchived").as("Plot Archive"),
        s("plotconsistency").as("Plot Consistency"),
        s("plotsize").as("Plot Size"),
        s("plotmethods").as("Plot Methods")).as("Plot Sampling and Analysis"),
      struct(
        s("CLASSIF_CONFIDENCE_DESC").as("Confidence Level"),
        cleaned("confidencecomments").as("Confidence Level Comments")).as("Confidence Level"),
      struct(
        s("grank").as("Global Rank"),
        s("grankreviewdate").as("Global Rank Review Date"),
        s("grankauthor").as("Global Rank Author"),
        s("grankreasons").as("Global Rank Reasons")).as("Conservation Status"),
      struct(
        coalesce(s("parent_id"), lit("nan")).as("parent_id"),
        s("hierarchylevel").as("hierarchylevel"),
        s("d_classification_level_id").as("d_classification_level_id"),
        s("unitsort").as("unitsort"),
        s("parentkey").as("parentkey"),
        s("parentname").as("parentname"),
        s("cached_hierarchy").as("Cached Hierarchy")).as("Hierarchy"),
      struct(
        s("lineage").as("Concept Lineage"),
        s("predecessor_records").as("Predecessors Raw Data"),
        s("obsolete_unit_records").as("Obsolete Units Raw Data"),
        s("obsolete_parent_records").as("Obsolete Parents Raw Data")).as("Concept History"),
      struct(s("synonymy").as("Synonymy")).as("Synonymy"),
      struct(
        s("primaryconceptsource").as("Concept Author"),
        s("descriptionauthor").as("Description Author"),
        s("acknowledgements").as("Acknowledgements"),
        s("versiondate").as("Version Date")).as("Authorship"),
      coalesce(s("reference_records"), array()).as("References"),
      lit(clock).as("Date Processed"),
      title.as("title"),
      coalesce(s("parent_id").cast("long"), lit(0L)).as("parent"),
      coalesce(s("children"), array()).as("children"),
      when(size(s("ancestors")) > 0, s("ancestors"))
        .otherwise(array(lit(0L))).as("ancestors"),
      s("element_global_id").as("id"))

    details.select(sourceData.as("source_data"),
      s("element_global_id").as("row_id"))
  }

  /** H4/F10 (`usnvc.py:223-234`, `:49-52`): the synthetic root document
    * (id "0") whose children are the parentless Class/Cultural Class
    * units. */
  def rootDoc(ctx: UsnvcContext): DataFrame =
    ctx.nvcsUnits
      .filter(col("parent_id").isNull)
      .agg(sort_array(collect_list(col("element_global_id").cast("long")))
        .as("children"))
      .select(
        struct(
          lit("US National Vegetation Classification").as("title"),
          lit(null).cast("long").as("parent"),
          lit(null).cast("array<bigint>").as("ancestors"),
          col("children"),
          struct(lit("0").as("unitsort")).as("Hierarchy"),
          lit("0").as("id")).as("source_data"),
        lit("0").as("row_id"))
}
