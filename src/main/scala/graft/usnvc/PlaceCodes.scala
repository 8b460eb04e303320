package graft.usnvc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offline replacement for the reference's per-row REST enrichment
  * (S5, `usnvc.py:533-553`: GET restcountries `/alpha/{code}?fields=name`,
  * memoized in a module global). A network call per row is neither
  * deterministic nor scalable; the engine ships the lookup as a
  * broadcast table joined in (SURVEY §2.1 S5).
  *
  * Codes cover the ISO-3166 alpha-2 values that occur in the USNVC
  * `nations` strings (North/Central American + Caribbean). Unknown
  * codes resolve to "Unknown", matching `usnvc.py:551`.
  */
object PlaceCodes {

  val codeToName: Map[String, String] = Map(
    "US" -> "United States of America",
    "CA" -> "Canada",
    "MX" -> "Mexico",
    "GL" -> "Greenland",
    "PM" -> "Saint Pierre and Miquelon",
    "BS" -> "Bahamas",
    "CU" -> "Cuba",
    "DO" -> "Dominican Republic",
    "HT" -> "Haiti",
    "JM" -> "Jamaica",
    "PR" -> "Puerto Rico",
    "VI" -> "Virgin Islands (U.S.)",
    "GT" -> "Guatemala",
    "BZ" -> "Belize",
    "HN" -> "Honduras",
    "SV" -> "El Salvador",
    "NI" -> "Nicaragua",
    "CR" -> "Costa Rica",
    "PA" -> "Panama")

  /** (abbreviation, name) lookup frame for broadcast joins. */
  def table(spark: SparkSession): DataFrame = {
    import spark.implicits._
    codeToName.toSeq.toDF("abbreviation", "name")
  }
}
