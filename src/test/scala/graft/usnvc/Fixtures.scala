package graft.usnvc

import java.nio.charset.Charset
import java.nio.file.{Files, Path}

/** Synthetic USNVC export fixtures (FIXTURES.md): the two stripped
  * tables are invented; the dim/link tables are minimal consistent
  * rows. Written as ISO-8859-1 TSVs (incl. an accented char to pin the
  * encoding path). Forest:
  *
  *   1000001 Class (root)          1000006 Cultural Class (root)
  *     ├ 1000002 Division            └ 1000007 Cultural Subclass
  *     │   └ 1000003 Macrogroup              (null colloquial/translated)
  *     │       └ 1000004 Group                 └ 1000012 Cultural Formation
  *     │           ├ 1000005 Association         └ 1000013 C. Subformation
  *     │           └ 1000010 Alliance               └ 1000014 C. Group
  *     │               └ 1000011 Association          └ 1000015 C. Subgroup
  *     │                   (adversarial: embedded       └ 1000016 C. Type
  *     │                    tab + doubled quote,           └ 1000017 C. Subtype
  *     │                    high-byte ISO-8859-1)              (max depth)
  *     └ 1000008 Subclass
  *         └ 1000009 Formation (full description row)
  *
  * The r5 extension hardens the fidelity surface: every Display-Title
  * CASE branch has a unit (Subclass/Formation via colloquial, Alliance
  * + all six deep Cultural levels via the otherwise-branch), the
  * cultural chain runs to max depth, and 1000011 carries text a real
  * export can legally contain — quoted TSV fields with embedded tabs
  * and doubled quotes (pandas-default quoting, which the reader
  * mirrors with escape='"').
  */
object Fixtures {

  private val T = "\t"

  val unitRows: Seq[Seq[String]] = {
    val h = Seq("element_global_id", "parent_id", "classif_confidence_id",
      "databasecode", "classificationcode", "scientificname",
      "formattedscientificname", "translatedname", "colloquialname",
      "hierarchylevel", "d_classification_level_id", "unitsort",
      "parentkey", "parentname")
    Seq(h,
      Seq("1000001", "", "1", "C01", "1", "Forestia", "<i>Forestia</i>",
        "Forest & Woodland", "Forest", "Class", "1", "1", "", ""),
      Seq("1000002", "1000001", "1", "D01", "1.A", "Forestia borealis",
        "<i>F. borealis</i>", "Boreal Forest", "Boreal", "Division", "4",
        "1.A", "C01", "Forest"),
      Seq("1000003", "1000002", "2", "M01", "M1", "Forestia b. acer",
        "&amp;lt;M&amp;gt;", "Maple Forest", "Maples", "Macrogroup", "5",
        "1.A.M1", "D01", "Boreal Forest"),
      Seq("1000004", "1000003", "2", "G01", "G1", "Forestia b. a. rubrum",
        "<i>rubrum</i>", "Red Maple Forest", "Red Maples", "Group", "6",
        "1.A.M1.G1", "M01", "Maple Forest"),
      Seq("1000005", "1000004", "1", "CEGL001", "A1", "Acer rubrum Forest",
        "<i>Acer rubrum</i>", "Red Maple Swamp Forest", "Red Maple Swamp",
        "Association", "8", "1.A.M1.G1.A1", "G01", "Red Maple Forest"),
      Seq("1000006", "", "2", "CC01", "7", "Cultura", "<i>Cultura</i>",
        "Agricultural & Developed Vegetation", "Cultural", "Cultural Class",
        "9", "7", "", ""),
      Seq("1000007", "1000006", "1", "CS01", "7.A", "Cultura herbacea",
        "herbacée", "", "", "Cultural Subclass", "10", "7.A",
        "CC01", "Cultural"),
      // r5: second natural branch — Subclass + Formation pin the
      // colloquial CASE branch at the two levels the original forest
      // skipped
      Seq("1000008", "1000001", "2", "S01", "1.B", "Forestia umbra",
        "<i>F. umbra</i>", "Shade Forest & Scrub", "Shade Forest",
        "Subclass", "2", "1.B", "C01", "Forest"),
      Seq("1000009", "1000008", "1", "F01", "1.B.1", "Forestia æstuosa",
        "<i>F. æstuosa</i>", "Humid Shade Forest", "Humid Forest",
        "Formation", "3", "1.B.1", "S01", "Shade Forest"),
      // r5: Alliance level (otherwise-branch title) between Group and
      // a second Association
      Seq("1000010", "1000004", "2", "A0100", "A100",
        "Acer rubrum Alliance", "<i>A. rubrum</i>", "Red Maple Alliance",
        "Red Maple All.", "Alliance", "7", "1.A.M1.G1.A100", "G01",
        "Red Maple Forest"),
      // r5: adversarial text — embedded tab + doubled quote land in
      // QUOTED TSV fields (legal pandas output); ISO-8859-1 high bytes
      Seq("1000011", "1000010", "1", "CEGL002", "A2",
        "Acer \"rubrum\" swampensis", "<i>Acer</i>\t\"tabbed\"",
        "Quoted & Tabbed Forêt", "Tab\there", "Association", "8",
        "1.A.M1.G1.A100.A2", "A0100", "Red Maple Alliance"),
      // r5: cultural chain to MAX DEPTH (all six deeper cultural
      // levels; 1000016 has empty translated name → null Display Title
      // at depth, 1000017 is the deepest leaf)
      Seq("1000012", "1000007", "1", "CF01", "7.A.1", "Cultura arvensis",
        "<i>C. arvensis</i>", "Cropland Formation", "Cropland",
        "Cultural Formation", "11", "7.A.1", "CS01", ""),
      Seq("1000013", "1000012", "2", "CSF01", "7.A.1.a",
        "Cultura arvensis rotata", "<i>C. a. rotata</i>",
        "Row Crop Subformation", "Row Crops", "Cultural Subformation",
        "12", "7.A.1.a", "CF01", "Cropland Formation"),
      Seq("1000014", "1000013", "1", "CG01", "7.A.1.a.1",
        "Cultura arvensis zea", "<i>C. a. zea</i>", "Corn Group",
        "Corn", "Cultural Group", "13", "7.A.1.a.1", "CSF01",
        "Row Crop Subformation"),
      Seq("1000015", "1000014", "2", "CSG01", "7.A.1.a.1.a",
        "Cultura arvensis zea irrigata", "<i>C. a. z. irrigata</i>",
        "Irrigated Corn Subgroup", "Irrigated Corn", "Cultural Subgroup",
        "14", "7.A.1.a.1.a", "CG01", "Corn Group"),
      Seq("1000016", "1000015", "1", "CT01", "7.A.1.a.1.a.1",
        "Cultura arvensis zea pivotalis", "<i>pivotalis</i>", "",
        "Pivot Corn", "Cultural Type", "15", "7.A.1.a.1.a.1", "CSG01",
        "Irrigated Corn Subgroup"),
      Seq("1000017", "1000016", "2", "CST01", "7.A.1.a.1.a.1.a",
        "Cultura arvensis zea pivotalis annua", "<i>annua</i>",
        "Annual Pivot Corn Subtype", "Annual Pivot Corn",
        "Cultural Subtype", "16", "7.A.1.a.1.a.1.a", "CT01",
        "Pivot Corn"))
  }

  val unitDescriptionRows: Seq[Seq[String]] = {
    val h = Seq("element_global_id", "typeconceptsentence", "typeconcept",
      "diagnosticcharacteristics", "rationale", "classificationcomments",
      "othercomments", "similarnvctypescomments", "physiognomy",
      "floristics", "dynamics", "environment", "spatialpattern", "range",
      "nations", "subnations", "tncecoregions", "omernikecoregions",
      "federallands", "plotcount", "plotsummary", "plottypal",
      "plotarchived", "plotconsistency", "plotsize", "plotmethods",
      "confidencecomments", "grank", "grankreviewdate", "grankauthor",
      "grankreasons", "lineage", "synonymy", "primaryconceptsource",
      "descriptionauthor", "acknowledgements", "versiondate")
    def blank(n: Int) = Seq.fill(n)("")
    Seq(h,
      // 1000001: entity chains incl. the &amp;lt; double-unescape case
      Seq("1000001", "Trees &amp; shrubs.", "Trees &amp;lt;tall&amp;gt; &amp; shrubs",
        "Has &lt;canopy&gt;", "", "", "", "", "Closed canopy", "Acer spp.",
        "Fire-adapted", "Uplands", "Matrix", "Northern hemisphere",
        "US, CA?, XX", "US:MA, US:VT", "42", "", "7", "12",
        "Plots exist", "Typal", "", "", "", "", "", "G5", "2017-01-01",
        "A. Author", "", "Lineage note", "Syn &amp; more", "Source A",
        "Desc B", "Thanks", "2018-03-01"),
      // 1000005: minimal description, no nations, no ints
      Seq("1000005") ++ blank(36),
      // 1000007: no description row at all (left-join null side covers 1000002/3/4/6)
      // r5 1000009: EVERY text section present at Formation level — the
      // full-presence side of the P7 type-presence matrix
      Seq("1000009", "Humid shade.", "Humid &amp; shady",
        "Moss &lt;mats&gt;", "Rationale text", "Classif comments",
        "Other comments", "Similar comments", "Open canopy",
        "Sphagnum spp.", "Flood-adapted", "Lowlands", "Linear",
        "Coastal plain", "US", "US:MA", "3", "8", "2", "5",
        "Summary text", "Typal", "Archived", "Consistent", "0.1 ha",
        "Releve", "Conf comments", "G3", "2016-06-15", "B. Author",
        "Reasons text", "Lineage 9", "Synonymy 9", "Source 9",
        "Author 9", "Ack 9", "2017-11-30"),
      // r5 1000011: adversarial quoted text — embedded tab + doubled
      // quotes + entity chain in ONE field exercises clean_string after
      // quote-aware TSV parsing
      Seq("1000011", "Quotes \"inside\" &amp; tabs\there.",
        "Deep &amp;lt;nest&amp;gt;", "Has\ttab") ++ blank(10) ++
        Seq("US", "US:VT", "1") ++ blank(2) ++ Seq("3") ++ blank(16) ++
        Seq("2019-05-05"),
      // r5 1000017: sparse-weird — ONLY an int-gated field and a grank
      // date present (presence predicates must fire independently)
      Seq("1000017") ++ blank(16) ++ Seq("4") ++ blank(10) ++
        Seq("2015-02-03") ++ blank(8)
    )
  }

  private def cell(s: String): String =
    if (s.exists(c => c == '\t' || c == '"' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def tsv(rows: Seq[Seq[String]]): String =
    rows.map(_.map(cell).mkString(T)).mkString("\n") + "\n"

  val tables: Map[String, String] = Map(
    "unit.txt" -> tsv(unitRows),
    "unitDescription.txt" -> tsv(unitDescriptionRows),
    "d_classif_confidence.txt" -> tsv(Seq(
      Seq("D_CLASSIF_CONFIDENCE_ID", "CLASSIF_CONFIDENCE_DESC", "DISPLAY_ORDER", "STATUS"),
      Seq("1", "High", "1", "Y"),
      Seq("2", "Moderate", "2", "Y"))),
    "d_curr_presence_absence.txt" -> tsv(Seq(
      Seq("D_CURR_PRESENCE_ABSENCE_ID", "CURR_PRESENCE_ABSENCE_DESC", "CURR_PRESENCE_ABSENCE_CD"),
      Seq("1", "Present", "P"),
      Seq("2", "Absent", "A"))),
    "d_dist_confidence.txt" -> tsv(Seq(
      Seq("D_DIST_CONFIDENCE_ID", "DIST_CONFIDENCE_CD", "DIST_CONFIDENCE_DESC"),
      Seq("1", "C", "Confident"))),
    "d_subnation.txt" -> tsv(Seq(
      Seq("subnation_id", "iso_nation_cd", "subnation_code", "subnation_name"),
      Seq("10", "US", "MA", "Massachusetts"),
      Seq("11", "US", "VT", "Vermont"))),
    "d_occurrence_status.txt" -> tsv(Seq(
      Seq("D_OCCURRENCE_STATUS_ID", "OCCURRENCE_STATUS_CD", "OCCURRENCE_STATUS_DESC"),
      Seq("1", "C", "Confirmed"))),
    "d_usfs_ecoregion1994.txt" -> tsv(Seq(
      Seq("USFS_ECOREGION_ID", "PARENT_USFS_ECOREGION_ID", "D_USFS_ECOREGION_LEVEL_ID",
        "USFS_ECOREGION_NAME", "USFS_ECOREGION_CLASS_CD", "USFS_ECOREGION_CONCAT_CD"),
      Seq("500", "", "1", "Adirondack", "M212", "M212"))),
    "d_usfs_ecoregion2007.txt" -> tsv(Seq(
      Seq("usfs_ecoregion_2007_id", "parent_usfs_ecoregion_2007_id",
        "d_usfs_ecoregion_level_id", "usfs_ecoregion_2007_name",
        "usfs_ecoregion_2007_concat_cd"),
      Seq("700", "", "1", "Northeastern Mixed", "211"))),
    "reference.txt" -> tsv(Seq(
      Seq("reference_id", "shortcitation", "fullcitation"),
      Seq("r1", "Smith 1990", "Smith, J. 1990. Forests."),
      Seq("r2", "Jones 1995", "Jones, K. 1995. More forests."))),
    "UnitXReference.txt" -> tsv(Seq(
      Seq("element_global_id", "reference_id"),
      Seq("1000001", "r1"),
      Seq("1000001", "r2"),
      Seq("1000011", "r1"))),
    "UnitXSimilarUnit.txt" -> tsv(Seq(
      Seq("element_global_id", "simglobal_id", "simnote", "simelcode",
        "simname", "simusstatus", "simlevelid"),
      Seq("1000005", "1000004", "Similar &amp; related", "G01",
        "Red Maple Forest", "Standard", "6"))),
    "UnitXSubnation.txt" -> tsv(Seq(
      Seq("element_global_id", "subnation_id", "d_curr_presence_absence_id",
        "d_dist_confidence_id"),
      Seq("1000005", "10", "1", "1"),
      Seq("1000005", "11", "2", "1"))),
    "UnitXEcoregionUsfs1994.txt" -> tsv(Seq(
      Seq("element_global_id", "usfs_ecoregion_id", "d_occurrence_status_id"),
      Seq("1000005", "500", "1"))),
    "UnitXEcoregionUsfs2007.txt" -> tsv(Seq(
      Seq("element_global_id", "usfs_ecoregion_2007_id", "d_occurrence_status_id"),
      Seq("1000005", "700", "1"))),
    "unitObsoleteName.txt" -> tsv(Seq(
      Seq("element_global_id", "obsoletename", "obsoletenote", "obsoletedate",
        "obsoleteauthority"),
      Seq("1000005", "Old Name", "renamed", "2001-01-01", "Panel"))),
    "unitObsoleteParent.txt" -> tsv(Seq(
      Seq("element_global_id", "obsoleteparentcode", "obsoletedivision",
        "obsoleteparentname", "obsoletenote", "obsoletedate", "obsoleteauthority"),
      Seq("1000005", "X01", "Old Div", "Old Parent", "moved", "2002-02-02", "Panel"))),
    "unitPredecessor.txt" -> tsv(Seq(
      Seq("element_global_id", "predecessor_id", "predecessorcode",
        "predecessorname", "predecessorsciname", "predecessorcolloquialname",
        "lineagedate", "lineagenote", "lineageauthorizedby"),
      Seq("1000005", "900001", "OLD1", "Old Assoc", "Acer old", "Old Swamp",
        "2000-01-01", "split", "Panel"))))

  /** Write all fixture tables under a fresh temp dir; returns its path. */
  def writeTo(dir: Path): String = {
    tables.foreach { case (name, content) =>
      Files.write(dir.resolve(name), content.getBytes(Charset.forName("ISO-8859-1")))
    }
    dir.toString
  }
}
