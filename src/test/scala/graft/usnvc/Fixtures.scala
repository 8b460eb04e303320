package graft.usnvc

import java.nio.charset.Charset
import java.nio.file.{Files, Path}

/** Synthetic USNVC export fixtures (FIXTURES.md): the two stripped
  * tables are invented; the dim/link tables are minimal consistent
  * rows. Written as ISO-8859-1 TSVs (incl. an accented char to pin the
  * encoding path). Forest:
  *
  *   1000001 Class (root)          1000006 Cultural Class (root)
  *     └ 1000002 Division            └ 1000007 Cultural Subclass
  *         └ 1000003 Macrogroup              (null colloquial/translated)
  *             └ 1000004 Group
  *                 └ 1000005 Association
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
        "CC01", "Cultural"))
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
    )
  }

  private def tsv(rows: Seq[Seq[String]]): String =
    rows.map(_.mkString(T)).mkString("\n") + "\n"

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
      Seq("1000001", "r2"))),
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
