package graft.usnvc

import org.apache.spark.sql.types._

/** Explicit schemas for the 21-table USNVC v2.02 relational export
  * (tab-delimited, ISO-8859-1, header row). The reference reads nearly
  * everything as string (`usnvc.py:109-218`, `dtype=str`), forcing only
  * the two classification-confidence keys to int (`usnvc.py:110,114`);
  * we pin every column explicitly — schema inference over ISO-8859-1
  * TSVs is the main portability hazard (SURVEY §1.2).
  *
  * Columns for the two stripped tables (`unit.txt`,
  * `unitDescription.txt`, `.MISSING_LARGE_BLOBS:1-2`) are reconstructed
  * from their usage in `usnvc.py:287-489` — see FIXTURES.md.
  */
object UsnvcSchemas {

  private def st(names: String*): StructType =
    StructType(names.map(n => StructField(n, StringType, nullable = true)))

  private def field(n: String, t: DataType): StructField =
    StructField(n, t, nullable = true)

  /** unit.txt — core units (usnvc.py:109-110: element_global_id str,
    * parent_id str, classif_confidence_id int). */
  val unit: StructType = StructType(Seq(
    field("element_global_id", StringType),
    field("parent_id", StringType),
    field("classif_confidence_id", IntegerType),
    field("databasecode", StringType),
    field("classificationcode", StringType),
    field("scientificname", StringType),
    field("formattedscientificname", StringType),
    field("translatedname", StringType),
    field("colloquialname", StringType),
    field("hierarchylevel", StringType),
    field("d_classification_level_id", StringType),
    field("unitsort", StringType),
    field("parentkey", StringType),
    field("parentname", StringType)))

  /** unitDescription.txt — long-text fields (usnvc.py:297-482 usage).
    * The four ecoregion/plot-count fields are integral in the source
    * (`type(row[x]) is int` gates, usnvc.py:389-401). */
  val unitDescription: StructType = StructType(Seq(
    field("element_global_id", StringType),
    field("typeconceptsentence", StringType),
    field("typeconcept", StringType),
    field("diagnosticcharacteristics", StringType),
    field("rationale", StringType),
    field("classificationcomments", StringType),
    field("othercomments", StringType),
    field("similarnvctypescomments", StringType),
    field("physiognomy", StringType),
    field("floristics", StringType),
    field("dynamics", StringType),
    field("environment", StringType),
    field("spatialpattern", StringType),
    field("range", StringType),
    field("nations", StringType),
    field("subnations", StringType),
    field("tncecoregions", LongType),
    field("omernikecoregions", LongType),
    field("federallands", LongType),
    field("plotcount", LongType),
    field("plotsummary", StringType),
    field("plottypal", StringType),
    field("plotarchived", StringType),
    field("plotconsistency", StringType),
    field("plotsize", StringType),
    field("plotmethods", StringType),
    field("confidencecomments", StringType),
    field("grank", StringType),
    field("grankreviewdate", StringType),
    field("grankauthor", StringType),
    field("grankreasons", StringType),
    field("lineage", StringType),
    field("synonymy", StringType),
    field("primaryconceptsource", StringType),
    field("descriptionauthor", StringType),
    field("acknowledgements", StringType),
    field("versiondate", StringType)))

  /** d_classif_confidence.txt (usnvc.py:113-114: id int). */
  val dClassifConfidence: StructType = StructType(Seq(
    field("D_CLASSIF_CONFIDENCE_ID", IntegerType),
    field("CLASSIF_CONFIDENCE_DESC", StringType),
    field("DISPLAY_ORDER", StringType),
    field("STATUS", StringType)))

  val dClassificationLevel: StructType =
    st("D_CLASSIFICATION_LEVEL_ID", "CLASSIFICATION_LEVEL_NAME",
      "DISPLAY_ORDER", "parent_level_id")

  val dCurrPresenceAbsence: StructType =
    st("D_CURR_PRESENCE_ABSENCE_ID", "CURR_PRESENCE_ABSENCE_DESC",
      "CURR_PRESENCE_ABSENCE_CD")

  val dDistConfidence: StructType =
    st("D_DIST_CONFIDENCE_ID", "DIST_CONFIDENCE_CD", "DIST_CONFIDENCE_DESC")

  val dOccurrenceStatus: StructType =
    st("D_OCCURRENCE_STATUS_ID", "OCCURRENCE_STATUS_CD", "OCCURRENCE_STATUS_DESC")

  val dSpatialPattern: StructType =
    st("d_spatial_pattern_id", "spatial_pattern_desc", "spatial_pattern_cd")

  val dSubnation: StructType =
    st("subnation_id", "iso_nation_cd", "subnation_code", "subnation_name")

  val dUsfsEcoregion1994: StructType =
    st("USFS_ECOREGION_ID", "PARENT_USFS_ECOREGION_ID",
      "D_USFS_ECOREGION_LEVEL_ID", "USFS_ECOREGION_NAME",
      "USFS_ECOREGION_CLASS_CD", "USFS_ECOREGION_CONCAT_CD")

  val dUsfsEcoregion2007: StructType =
    st("usfs_ecoregion_2007_id", "parent_usfs_ecoregion_2007_id",
      "d_usfs_ecoregion_level_id", "usfs_ecoregion_2007_name",
      "usfs_ecoregion_2007_concat_cd")

  val dUsfsEcoregionLevel: StructType =
    st("D_USFS_ECOREGION_LEVEL_ID", "USFS_ECOREGION_LEVEL_DESC", "PARENT_LEVEL_ID")

  val reference: StructType =
    st("reference_id", "shortcitation", "fullcitation")

  val unitXReference: StructType =
    st("element_global_id", "reference_id")

  val unitXSimilarUnit: StructType =
    st("element_global_id", "simglobal_id", "simnote", "simelcode",
      "simname", "simusstatus", "simlevelid")

  val unitXSubnation: StructType =
    st("element_global_id", "subnation_id", "d_curr_presence_absence_id",
      "d_dist_confidence_id")

  val unitXEcoregionUsfs1994: StructType =
    st("element_global_id", "usfs_ecoregion_id", "d_occurrence_status_id")

  val unitXEcoregionUsfs2007: StructType =
    st("element_global_id", "usfs_ecoregion_2007_id", "d_occurrence_status_id")

  val unitObsoleteName: StructType =
    st("element_global_id", "obsoletename", "obsoletenote", "obsoletedate",
      "obsoleteauthority")

  val unitObsoleteParent: StructType =
    st("element_global_id", "obsoleteparentcode", "obsoletedivision",
      "obsoleteparentname", "obsoletenote", "obsoletedate", "obsoleteauthority")

  val unitPredecessor: StructType =
    st("element_global_id", "predecessor_id", "predecessorcode",
      "predecessorname", "predecessorsciname", "predecessorcolloquialname",
      "lineagedate", "lineagenote", "lineageauthorizedby")

  /** file name → schema for every table the pipeline reads. */
  val byFile: Map[String, StructType] = Map(
    "unit.txt" -> unit,
    "unitDescription.txt" -> unitDescription,
    "d_classif_confidence.txt" -> dClassifConfidence,
    "d_classification_level.txt" -> dClassificationLevel,
    "d_curr_presence_absence.txt" -> dCurrPresenceAbsence,
    "d_dist_confidence.txt" -> dDistConfidence,
    "d_occurrence_status.txt" -> dOccurrenceStatus,
    "d_spatial_pattern.txt" -> dSpatialPattern,
    "d_subnation.txt" -> dSubnation,
    "d_usfs_ecoregion1994.txt" -> dUsfsEcoregion1994,
    "d_usfs_ecoregion2007.txt" -> dUsfsEcoregion2007,
    "d_usfs_ecoregion_level.txt" -> dUsfsEcoregionLevel,
    "reference.txt" -> reference,
    "UnitXReference.txt" -> unitXReference,
    "UnitXSimilarUnit.txt" -> unitXSimilarUnit,
    "UnitXSubnation.txt" -> unitXSubnation,
    "UnitXEcoregionUsfs1994.txt" -> unitXEcoregionUsfs1994,
    "UnitXEcoregionUsfs2007.txt" -> unitXEcoregionUsfs2007,
    "unitObsoleteName.txt" -> unitObsoleteName,
    "unitObsoleteParent.txt" -> unitObsoleteParent,
    "unitPredecessor.txt" -> unitPredecessor)
}
