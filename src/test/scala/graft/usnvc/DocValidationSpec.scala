package graft.usnvc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract tests for the draft-07 output-schema validator
  * (`/root/reference/README.md:48-174`): every clause — required
  * fields, per-field JSON types, the optional typed sections — must
  * reject a malformed doc with the right message and accept a
  * conforming one. */
class DocValidationSpec extends SparkSpec {

  private def errOf(doc: String): Option[String] = {
    import spark.implicits._
    Option(Seq(doc).toDF("doc")
      .select(DocValidation.validateDoc(col("doc")).as("error"))
      .collect().head.getAs[String](0))
  }

  test("conforming minimal doc passes") {
    assert(errOf("""{"source_data": {"a": 1}, "row_id": "0"}""").isEmpty)
  }

  test("conforming doc with all optional sections passes") {
    assert(errOf(
      """{"source_data": {}, "row_id": "7",
        | "data": {"feature_id": "f", "feature_name": "n",
        |          "feature_description": "d", "feature_class": "c"},
        | "geometry": {"geometry": {"type": "Point", "coordinates": [1, 2]}},
        | "srid": 4326}""".stripMargin.replace("\n", "")).isEmpty)
  }

  test("invalid json rejected") {
    assert(errOf("not json").contains("document is not valid json"))
  }

  test("non-object document rejected") {
    assert(errOf("[1,2]").contains("document is not of type 'object'"))
  }

  test("missing row_id rejected as required-property violation") {
    assert(errOf("""{"source_data": {}}""")
      .contains("'row_id' is a required property"))
  }

  test("missing source_data rejected as required-property violation") {
    assert(errOf("""{"row_id": "1"}""")
      .contains("'source_data' is a required property"))
  }

  test("JSON-null row_id passes required but fails type (draft-07 semantics)") {
    assert(errOf("""{"source_data": {}, "row_id": null}""")
      .contains("row_id is not of type 'string'"))
  }

  test("numeric row_id rejected: wrong JSON type") {
    assert(errOf("""{"source_data": {}, "row_id": 5}""")
      .contains("row_id is not of type 'string'"))
  }

  test("array source_data rejected: wrong JSON type") {
    assert(errOf("""{"source_data": [], "row_id": "1"}""")
      .contains("source_data is not of type 'object'"))
  }

  test("data section: missing required feature field rejected") {
    assert(errOf("""{"source_data": {}, "row_id": "1",
      | "data": {"feature_id": "x"}}""".stripMargin.replace("\n", ""))
      .contains("'feature_name' is a required property"))
  }

  test("data section: non-string feature field rejected") {
    assert(errOf(
      """{"source_data": {}, "row_id": "1",
        | "data": {"feature_id": 9, "feature_name": "n",
        |          "feature_description": "d", "feature_class": "c"}}"""
        .stripMargin.replace("\n", ""))
      .contains("data.feature_id is not of type 'string'"))
  }

  test("data section: non-object data rejected") {
    assert(errOf("""{"source_data": {}, "row_id": "1", "data": "x"}""")
      .contains("data is not of type 'object'"))
  }

  test("geometry: missing inner geometry rejected") {
    assert(errOf("""{"source_data": {}, "row_id": "1", "geometry": {}}""")
      .contains("'geometry' is a required property"))
  }

  test("geometry: missing type rejected") {
    assert(errOf(
      """{"source_data": {}, "row_id": "1",
        | "geometry": {"geometry": {"coordinates": [1]}}}"""
        .stripMargin.replace("\n", ""))
      .contains("'type' is a required property"))
  }

  test("geometry: missing coordinates rejected") {
    assert(errOf(
      """{"source_data": {}, "row_id": "1",
        | "geometry": {"geometry": {"type": "Point"}}}"""
        .stripMargin.replace("\n", ""))
      .contains("'coordinates' is a required property"))
  }

  test("geometry: coordinates accept any JSON value (schema has no type)") {
    assert(errOf(
      """{"source_data": {}, "row_id": "1",
        | "geometry": {"geometry": {"type": "Point", "coordinates": "raw"}}}"""
        .stripMargin.replace("\n", "")).isEmpty)
  }

  test("string srid rejected: wrong JSON type") {
    assert(errOf("""{"source_data": {}, "row_id": "1", "srid": "4326"}""")
      .contains("srid is not of type 'integer'"))
  }

  test("float srid rejected: wrong JSON type") {
    assert(errOf("""{"source_data": {}, "row_id": "1", "srid": 1.5}""")
      .contains("srid is not of type 'integer'"))
  }
}
