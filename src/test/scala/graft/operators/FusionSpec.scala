package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal fusion dedup: identical image-text pairs must score
  * fused_ppm = 10^6; every emitted pair's jaccard must equal the exact
  * shingle Jaccard; candidates must cover BOTH modality blockings. */
class FusionSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // = doc 1
    (3L, "the quick brown fox jumps over the lazy dog again and once"),  // near-dup text
    (4L, "completely different content about distributed query engines"),
    (5L, "another unrelated document describing parquet column pruning"))
    .toDF("doc_id", "text")
    .select(col("doc_id"), col("text"), encode(col("text"), "UTF-8").as("payload"))

  private def pairsAt(minFused: Double) =
    Fusion.imageTextNearDupPairs(corpus, "doc_id", "text", "payload",
      dim = 16, shingleN = 3, numHashes = 16, bands = 4, nBits = 8,
      minFused = minFused, portable = true)

  test("identical image-text pairs score fused 1.0 (= 1e6 ppm)") {
    val rows = pairsAt(0.6).collect()
    val dup = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(dup.isDefined, s"exact duplicate pair (1,2) missing: ${rows.mkString(",")}")
    assert(dup.get.getDouble(2) == 1.0) // jaccard
    assert(dup.get.getDouble(3) == 1.0) // cosine (identical bytes -> same embedding)
    assert(dup.get.getLong(4) == 1000000L) // fused_ppm
  }

  test("emitted jaccard equals the exact shingle Jaccard") {
    val got = pairsAt(-1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, minJaccard = 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { case (pair, j) =>
      if (j > 0.0)
        assert(exact.get(pair).contains(j),
          s"pair $pair jaccard $j != exact ${exact.get(pair)}")
    }
  }

  test("near-dup text pair (1,3) verifies when threshold admits text-only match") {
    // docs 1 and 3 share most shingles but have different payload bytes,
    // so the image cosine is stub-random; with minFused = -1 every
    // verified candidate surfaces and (1,3) must be among them via the
    // text modality
    val rows = pairsAt(-1.0).collect()
    val pair = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 3L)
    assert(pair.isDefined, "text near-dup (1,3) not in verified candidates")
    assert(pair.get.getDouble(2) > 0.5, "expected high text jaccard")
    assert(math.abs(pair.get.getDouble(3)) <= 1.0)
  }

  test("adaptive text+image blocking (default path) finds the exact dup") {
    // bands/nBits unset -> both modalities size from the corpus count;
    // the exact pair (1,2) collides at ANY band shape / bit width
    val rows = Fusion.imageTextNearDupPairs(corpus, "doc_id", "text",
      "payload", dim = 16, minFused = 0.6, portable = true).collect()
    val dup = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(dup.isDefined, s"exact dup (1,2) missing under adaptive blocking")
    assert(dup.get.getLong(4) == 1000000L)
  }

  test("capped text blocking still finds the exact dup (anchor path)") {
    val rows = Fusion.imageTextNearDupPairs(corpus, "doc_id", "text",
      "payload", dim = 16, shingleN = 3, numHashes = 16, bands = 4,
      nBits = 8, minFused = 0.6, portable = true, maxTextBucket = 1)
      .collect()
    // with cap=1 only the min-id anchor pairs within each text bucket,
    // and (1,2)'s anchor IS doc 1 — the pair must survive
    val dup = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(dup.isDefined, "exact dup (1,2) lost under anchor cap")
  }

  test("fusion releases every internal frame") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    pairsAt(0.6).count()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"fusion leaked pinned storage: $leaked")
  }
}
