package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing coverage: documents' text re-encoded as a binary
  * payload column, then pushed through the mapPartitions decode /
  * frame-sample operators. The stub codec is md5-derived, so DuckDB can
  * replay the exact metadata — the oracle checks the whole binary
  * round-trip (encode → bytes → digest → struct), not just SQL math.
  */
object MultimodalQueries {

  /** Image-metadata decode over a binary column. */
  def mediaMeta(s: SparkSession, d: String): DataFrame = {
    val withPayload = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    Multimodal.withImageMeta(withPayload, "payload")
      .select(col("doc_id"),
        col("media_meta.byte_len").as("byte_len"),
        col("media_meta.width").as("width"),
        col("media_meta.height").as("height"),
        col("media_meta.channels").as("channels"))
  }

  val mediaMetaSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text))::BIGINT AS byte_len,
      |  64 + ('0x'||substr(md5(text),1,4))::INT % 1985 AS width,
      |  64 + ('0x'||substr(md5(text),5,4))::INT % 1985 AS height,
      |  3 AS channels
      |FROM documents""".stripMargin

  /** Every-6th-frame sampling of a 24-"frame" payload. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val withPayload = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    Multimodal.sampleFrames(withPayload, "doc_id", "payload",
      frameCount = 24, everyN = 6)
  }

  val frameSampleSql: String =
    """SELECT doc_id, f AS frame_idx,
      |  (f * greatest(octet_length(encode(text)) // 24, 1))::BIGINT AS byte_offset
      |FROM documents, unnest([0, 6, 12, 18]) t(f)""".stripMargin

  /** Feature extraction (Array[Float] embedding per payload). The
    * registered output lifts each float32 feature to a scaled long
    * (`round(f * 1e6)`) rendered as a CSV string — the same
    * integer-lift pattern as money-to-cents — because raw array<float>
    * columns aren't orderable by the harness canonicalizer. The oracle
    * replays the EXACT float32 pipeline via DuckDB FLOAT4 arithmetic
    * (verified bit-equal to JVM float math for all 256 byte values), so
    * this checks the real float path, not just the digest bytes. The
    * raw-array path stays spec-tested in MultimodalSpec. */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    val withPayload = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    Multimodal.withFeatures(withPayload, "payload", dim = 16)
      .select(col("doc_id"),
        array_join(transform(col("features"),
          f => round(f.cast("double") * 1e6).cast("long").cast("string")),
          ",").as("features_scaled"))
  }

  /** One FLOAT4 term per feature dim, mirroring FakeCodec.features:
    * byte j = digest((i*7+3) % 16); f = (j/255f)*2f - 1f. */
  val mediaFeaturesSql: String = {
    val terms = (0 until 16).map { i =>
      val j = (i * 7 + 3) % 16
      s"round((((('0x'||substr(md5(text),${j * 2 + 1},2))::INT::FLOAT4 / 255::FLOAT4) * 2::FLOAT4) - 1::FLOAT4)::DOUBLE * 1000000)::BIGINT::VARCHAR"
    }
    s"""SELECT doc_id, concat_ws(',', ${terms.mkString(",\n  ")}) AS features_scaled
       |FROM documents""".stripMargin
  }

  def all: Seq[Q] = Seq(
    Q("q29_media_meta", mediaMeta, Some(mediaMetaSql)),
    Q("q30_frame_sample", frameSample, Some(frameSampleSql)),
    Q("q31_media_features", mediaFeatures, Some(mediaFeaturesSql)))
}
