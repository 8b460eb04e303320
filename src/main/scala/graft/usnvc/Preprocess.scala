package graft.usnvc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 9 joined frames the reference's `preprocess_usnvc` returns
  * (`usnvc.py:85-220`), as lazy DataFrames.
  *
  * Join fidelity (SURVEY §2.3): pandas `merge` keeps BOTH key columns
  * when the names differ only by case (e.g. `d_curr_presence_absence_id`
  * and `D_CURR_PRESENCE_ABSENCE_ID` both appear in output records), so
  * all dim joins here use an explicit equality condition — never
  * `Seq(key)` — to retain both sides.
  *
  * Scale: every dim table is tiny (3–1 506 rows) → broadcast hash joins,
  * so the only shuffle-bearing frames are the fact-table scans
  * themselves. The reference re-runs this whole function once per output
  * row (`usnvc.py:71`); here it is one lazy plan evaluated once.
  */
final case class UsnvcContext(
    nvcsUnits: DataFrame,
    unitXSimilarUnit: DataFrame,
    nvcsDistribution: DataFrame,
    usfsEcoregionDistribution1994: DataFrame,
    usfsEcoregionDistribution2007: DataFrame,
    unitPredecessors: DataFrame,
    obsoleteUnits: DataFrame,
    obsoleteParents: DataFrame,
    unitReferences: DataFrame)

object Preprocess {

  def apply(spark: SparkSession, dir: String): UsnvcContext = {
    val t = UsnvcSources.readAll(spark, dir)

    // J1+J2 (usnvc.py:115-120): unit ⟕ unitDescription on
    // element_global_id, then ⟕ d_classif_confidence on the renamed
    // classif_confidence_id (P1).
    val confidence = t("d_classif_confidence.txt")
      .withColumnRenamed("D_CLASSIF_CONFIDENCE_ID", "classif_confidence_id")
    val nvcsUnits = t("unit.txt")
      .join(t("unitDescription.txt"), Seq("element_global_id"), "left")
      .join(broadcast(confidence), Seq("classif_confidence_id"), "left")

    // J3 (usnvc.py:128-133): references inner-joined to the link table.
    val unitReferences = t("UnitXReference.txt")
      .join(broadcast(t("reference.txt")), Seq("reference_id"), "inner")

    // J4–J6 (usnvc.py:166-179): subnation distribution with both-case
    // key retention on the presence/absence and confidence dims.
    val dist = t("UnitXSubnation.txt")
    val presAbs = broadcast(t("d_curr_presence_absence.txt"))
    val distConf = broadcast(t("d_dist_confidence.txt"))
    val subnations = broadcast(t("d_subnation.txt"))
    val nvcsDistribution = dist
      .join(presAbs,
        dist("d_curr_presence_absence_id") === presAbs("D_CURR_PRESENCE_ABSENCE_ID"))
      .join(distConf,
        dist("d_dist_confidence_id") === distConf("D_DIST_CONFIDENCE_ID"))
      .join(subnations, Seq("subnation_id"), "inner")

    // J7–J10 (usnvc.py:190-207): USFS ecoregion distributions.
    val eco94 = t("UnitXEcoregionUsfs1994.txt")
    val dEco94 = broadcast(t("d_usfs_ecoregion1994.txt"))
    val occ = t("d_occurrence_status.txt")
    val usfs1994 = eco94
      .join(dEco94, eco94("usfs_ecoregion_id") === dEco94("USFS_ECOREGION_ID"))
    val usfs1994Full = usfs1994
      .join(broadcast(occ),
        usfs1994("d_occurrence_status_id") === occ("D_OCCURRENCE_STATUS_ID"))
    val eco07 = t("UnitXEcoregionUsfs2007.txt")
    val usfs2007 = eco07
      .join(broadcast(t("d_usfs_ecoregion2007.txt")), Seq("usfs_ecoregion_2007_id"), "inner")
    val usfs2007Full = usfs2007
      .join(broadcast(occ),
        usfs2007("d_occurrence_status_id") === occ("D_OCCURRENCE_STATUS_ID"))

    UsnvcContext(
      nvcsUnits = nvcsUnits,
      unitXSimilarUnit = t("UnitXSimilarUnit.txt"),
      nvcsDistribution = nvcsDistribution,
      usfsEcoregionDistribution1994 = usfs1994Full,
      usfsEcoregionDistribution2007 = usfs2007Full,
      unitPredecessors = t("unitPredecessor.txt"),
      obsoleteUnits = t("unitObsoleteName.txt"),
      obsoleteParents = t("unitObsoleteParent.txt"),
      unitReferences = unitReferences)
  }
}
