package graft.usnvc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Full output-contract validation (`/root/reference/README.md:48-174`):
  * the downstream harness validates every emitted document against a
  * draft-07 JSON Schema — required `source_data` (object) + `row_id`
  * (string), optional typed `data{feature_id, feature_name,
  * feature_description, feature_class}` (all strings), `geometry`
  * (nested object with required `type`/`coordinates`), and `srid`
  * (integer). Implemented engine-side over Spark 4 VARIANT: JSON types
  * are checked from `schema_of_variant`, so a number-typed `row_id` or
  * string-typed `srid` is rejected exactly as `jsonschema` would.
  *
  * Draft-07 subtleties reproduced:
  *  - `required` checks key PRESENCE; a present-but-JSON-null value
  *    passes `required` and then fails its `type` check (variant maps
  *    missing → SQL NULL, JSON null → VOID — distinguishable).
  *  - optional sections are validated only when present.
  *  - inner `geometry.geometry.coordinates` has no `type` constraint
  *    in the schema (any JSON value passes; it only must exist).
  */
object DocValidation {

  private val IntegerTypes = Seq("TINYINT", "SMALLINT", "INT", "BIGINT")

  private def typeOf(v: Column): Column = schema_of_variant(v)
  private def isObject(v: Column): Column = typeOf(v).startsWith("OBJECT<")
  private def isString(v: Column): Column = typeOf(v) === "STRING"

  /** First schema violation for the document JSON, or NULL when the
    * doc conforms. Message text mirrors python-jsonschema's phrasing so
    * error sidecars read the same as the reference harness's. */
  def validateDoc(doc: Column): Column = {
    val v = try_parse_json(doc)
    def get(path: String): Column = try_variant_get(v, path, "variant")

    val rid = get("$.row_id")
    val sd = get("$.source_data")
    val data = get("$.data")
    val geomOuter = get("$.geometry")
    val geomInner = get("$.geometry.geometry")
    val gType = get("$.geometry.geometry.type")
    val gCoords = get("$.geometry.geometry.coordinates")
    val srid = get("$.srid")

    val dataFieldChecks = Seq("feature_id", "feature_name",
      "feature_description", "feature_class").foldLeft(lit(null).cast("string")) {
      case (acc, f) =>
        val fv = get(s"$$.data.$f")
        coalesce(acc,
          when(data.isNotNull && isObject(data) && fv.isNull,
            lit(s"'$f' is a required property")),
          when(data.isNotNull && isObject(data) && !isString(fv),
            lit(s"data.$f is not of type 'string'")))
    }

    when(v.isNull, lit("document is not valid json"))
      .when(!isObject(v), lit("document is not of type 'object'"))
      .when(rid.isNull, lit("'row_id' is a required property"))
      .when(sd.isNull, lit("'source_data' is a required property"))
      .when(!isString(rid), lit("row_id is not of type 'string'"))
      .when(!isObject(sd), lit("source_data is not of type 'object'"))
      .when(data.isNotNull && !isObject(data), lit("data is not of type 'object'"))
      .when(dataFieldChecks.isNotNull, dataFieldChecks)
      .when(geomOuter.isNotNull && !isObject(geomOuter),
        lit("geometry is not of type 'object'"))
      .when(geomOuter.isNotNull && geomInner.isNull,
        lit("'geometry' is a required property"))
      .when(geomOuter.isNotNull && !isObject(geomInner),
        lit("geometry.geometry is not of type 'object'"))
      .when(geomInner.isNotNull && isObject(geomInner) && gType.isNull,
        lit("'type' is a required property"))
      .when(geomInner.isNotNull && isObject(geomInner) && !isString(gType),
        lit("geometry.geometry.type is not of type 'string'"))
      .when(geomInner.isNotNull && isObject(geomInner) && gCoords.isNull,
        lit("'coordinates' is a required property"))
      .when(srid.isNotNull && !typeOf(srid).isin(IntegerTypes: _*),
        lit("srid is not of type 'integer'"))
      .otherwise(lit(null).cast("string"))
  }
}
