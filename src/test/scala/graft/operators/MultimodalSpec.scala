package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "hello world"),
    (2L, ""),
    (3L, "another payload with more bytes in it")
  ).toDF("id", "text")
    .select($"id", encode($"text", "UTF-8").as("payload"))

  private lazy val withNull = media.unionByName(
    Seq(Tuple1(99L)).toDF("id").withColumn("payload", lit(null).cast("binary")))

  test("withImageMeta: deterministic md5-derived dims, null-safe") {
    val m = Multimodal.withImageMeta(withNull, "payload")
      .select($"id", $"media_meta").collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    assert(m(99L).isEmpty)
    val r1 = m(1L).get
    assert(r1.getLong(0) == "hello world".length) // byte_len
    val (w, h, c) = Multimodal.FakeCodec.imageMeta("hello world".getBytes("UTF-8"))
    assert(r1.getInt(1) == w && r1.getInt(2) == h && r1.getInt(3) == c)
    assert(w >= 64 && w < 64 + 1985)
  }

  test("withFeatures: fixed-dim float vectors, pure function of bytes") {
    val f = Multimodal.withFeatures(media, "payload", dim = 8)
      .select($"id", $"features").as[(Long, Array[Float])].collect().toMap
    assert(f.values.forall(_.length == 8))
    assert(f.values.flatten.forall(v => v >= -1.0f && v <= 1.0f))
    assert(f(1L).toSeq ==
      Multimodal.FakeCodec.features("hello world".getBytes("UTF-8"), 8).toSeq)
    // distinct payloads → distinct embeddings (md5 collision-free here)
    assert(f(1L).toSeq != f(3L).toSeq)
  }

  test("batched features equal per-row features for every batch size incl. nulls") {
    val perRow = Multimodal.withFeatures(withNull, "payload", dim = 8)
      .select($"id", $"features").as[(Long, Option[Array[Float]])]
      .collect().map { case (i, f) => i -> f.map(_.toSeq) }.toMap
    for (bs <- Seq(1, 2, 3, 100)) {
      val batched = Multimodal.withFeaturesBatched(withNull, "payload",
        dim = 8, batchSize = bs)
        .select($"id", $"features").as[(Long, Option[Array[Float]])]
        .collect().map { case (i, f) => i -> f.map(_.toSeq) }.toMap
      assert(batched == perRow, s"batchSize=$bs")
    }
    assert(perRow(99L).isEmpty) // null payload → null features
  }

  test("sampleFrames explodes every-nth-frame offsets, skips nulls") {
    val frames = Multimodal.sampleFrames(withNull, "id", "payload",
      frameCount = 24, everyN = 6)
      .as[(Long, Int, Long)].collect()
    assert(!frames.exists(_._1 == 99L))
    val f3 = frames.filter(_._1 == 3L).sortBy(_._2)
    assert(f3.map(_._2).toSeq == Seq(0, 6, 12, 18))
    val frameSize = math.max("another payload with more bytes in it".length / 24, 1)
    assert(f3.map(_._3).toSeq == Seq(0L, 6L * frameSize, 12L * frameSize, 18L * frameSize))
  }
}
