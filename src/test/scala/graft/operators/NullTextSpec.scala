package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-text robustness: null / empty / whitespace-only / single-
  * token documents must flow through the text family without crashes,
  * and their behavior is pinned so ingestion of dirty corpora (the
  * normal case at 100 TB) is deterministic rather than accidental. */
class NullTextSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dirty = Seq(
    (1L, null.asInstanceOf[String]),
    (2L, ""),
    (3L, "   \t  "),
    (4L, "single"),
    (5L, "two words"),
    (6L, "a normal document with enough words to shingle"),
    (7L, ""),
    (8L, null.asInstanceOf[String]) // second null doc: nulls must not
                                    // pair even with EACH OTHER
  ).toDF("doc_id", "text")

  test("shingles: degenerate docs yield their whole text as one shingle") {
    val sh = Dedup.shingles(dirty, "doc_id", "text", n = 3)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    // null text drops (no tokens to shingle); empty/whitespace/short
    // docs collapse to a single whole-text shingle
    assert(!sh.contains(1L) || sh(1L) >= 0) // pinned: no crash either way
    assert(sh.getOrElse(2L, 0L) <= 1)
    assert(sh.getOrElse(3L, 0L) <= 1)
    assert(sh(4L) == 1)
    assert(sh(5L) == 1)
    assert(sh(6L) > 1)
  }

  test("minhash/simhash/jaccard pipelines accept degenerate docs") {
    // no exceptions, and identical degenerate docs pair up while null
    // never pairs with anything
    val nulls = Seq(1L, 8L)
    def touchesNull(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("id_a").isin(nulls: _*) ||
        col("id_b").isin(nulls: _*)).count()
    val pairs = Dedup.minHashPairs(dirty, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 4, minJaccard = 0.5)
    assert(touchesNull(pairs) == 0)
    val sim = Dedup.simHashPairs(dirty, "doc_id", "text",
      shingleN = 3, maxHamming = 3)
    assert(touchesNull(sim) == 0)
    val jac = Dedup.ngramJaccardPairs(dirty, "doc_id", "text",
      n = 3, minJaccard = 0.5, maxDocFreq = None)
    assert(touchesNull(jac) == 0)
    // identical empty docs ARE duplicates under the whole-text rule
    // (whitespace-only tokenizes to a DIFFERENT whole-text shingle than
    // empty — "" vs " " — so 2/3 stay distinct; determinism is the
    // contract, not any particular collapsing)
    assert(jac.filter(col("id_a") === 2L && col("id_b") === 7L).count() == 1)
    assert(jac.filter(col("id_a") === 2L && col("id_b") === 3L).count() == 0)
  }

  test("text stats and quality flow nulls as nulls, not crashes") {
    val stats = TextAnalysis.withTextStats(dirty, "text")
    assert(stats.count() == 8)
    val q = dirty.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("q"))
    assert(q.count() == 8)
    // a null document must not score higher than a real one
    val byId = q.as[(Long, Option[Double])].collect().toMap
    assert(byId(1L).forall(_ <= byId(6L).getOrElse(Double.MaxValue)))
  }

  test("incremental dedup admits EVERY null-text doc (blocking decides; nulls never collide)") {
    // q80's decision is blocking-only (no verification step), so null
    // docs colliding spuriously would silently drop real data — both
    // null docs must be admitted, across batches AND within one batch
    val gotAcross = graft.streaming.StreamingDedup.incrementalDedup(
      dirty, "doc_id", "text",
      pmod(col("doc_id"), lit(2)).cast("int"), nBatches = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(Set(1L, 8L).subsetOf(gotAcross))
    val gotWithin = graft.streaming.StreamingDedup.incrementalDedup(
      dirty, "doc_id", "text", lit(0), nBatches = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(Set(1L, 8L).subsetOf(gotWithin))
  }

  test("fused incremental dedup admits null-text null-payload docs") {
    // the q81 shape: null text also means null payload -> null features;
    // unguarded hyperplane bucketing would send every null doc to
    // bucket 0 and reject all but the first
    val withPayload = dirty.withColumn("payload",
      encode(col("text"), "UTF-8"))
    val got = graft.streaming.StreamingDedup.incrementalDedupBlocked(
      withPayload, "doc_id",
      pmod(col("doc_id"), lit(2)).cast("int"), nBatches = 2,
      graft.streaming.StreamingDedup.fusedBlocks("doc_id", "text",
        "payload", dim = 16, portable = true))
      .select("doc_id").as[Long].collect().toSet
    assert(Set(1L, 8L).subsetOf(got))
  }

  test("fusion pair operator never pairs null-payload docs") {
    val withPayload = dirty.withColumn("payload",
      encode(col("text"), "UTF-8"))
    val pairs = Fusion.imageTextNearDupPairs(withPayload, "doc_id",
      "text", "payload", dim = 16, minFused = 0.0)
    assert(pairs.filter(col("id_a").isin(1L, 8L) ||
      col("id_b").isin(1L, 8L)).count() == 0)
  }
}
