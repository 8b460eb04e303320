package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content entirely here now"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "short text")
  ).toDF("id", "text")

  test("shingles: n-gram count = tokens-n+1; short docs collapse to one") {
    val sh = Dedup.shingles(docs, "id", "text", 3)
    val counts = sh.groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(counts(1L) == 7) // 9 tokens, 7 trigrams
    assert(counts(5L) == 1) // < n tokens → whole text
    assert(sh.filter($"id" === 5L).head().getString(1) == "short text")
  }

  test("exact dedup keeps min id and counts copies") {
    val d = Dedup.exact(docs, "id", Seq(TextAnalysis.fingerprint($"text")))
      .as[(String, Long, Long)].collect()
    assert(d.length == 4)
    val dup = d.filter(_._3 == 2)
    assert(dup.length == 1 && dup.head._2 == 1L)
  }

  test("ngram jaccard finds near and exact dups with correct scores") {
    val pairs = Dedup.ngramJaccardPairs(docs, "id", "text", 3, 0.3)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 4L)) == 1.0)
    // 1 vs 2: 6 common of 8 distinct trigrams
    assert(math.abs(pairs((1L, 2L)) - 6.0 / 8.0) < 1e-12)
    assert(!pairs.contains((1L, 3L)))
  }

  test("stop-shingle cap: loose cap exact, tight cap subset") {
    val exact = Dedup.ngramJaccardPairs(docs, "id", "text", 3, 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val loose = Dedup.ngramJaccardPairs(docs, "id", "text", 3, 0.3,
      maxDocFreq = Some(100)).as[(Long, Long, Double)].collect().toSet
    assert(loose == exact)
    val tight = Dedup.ngramJaccardPairs(docs, "id", "text", 3, 0.3,
      maxDocFreq = Some(1)).as[(Long, Long, Double)].collect().toSet
    assert(tight.subsetOf(exact))
    assert(tight.size < exact.size) // shared trigrams all have df>=2 here
  }

  test("containment: embedded doc found at C=1.0 where jaccard misses it") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho"),
      (3L, "totally unrelated words live here")
    ).toDF("id", "text")
    // doc 1 (3 trigrams) is fully contained in doc 2 (15 trigrams):
    // jaccard = 3/15 = 0.2 — invisible to q19's 0.5 bar
    val j = Dedup.ngramJaccardPairs(corpus, "id", "text", 3, 0.5,
      maxDocFreq = Some(100))
    assert(j.count() == 0)
    val c = Dedup.containmentPairs(corpus, "id", "text", 3, 0.8, 100)
      .as[(Long, Long, Double)].collect()
    assert(c.toSeq == Seq((1L, 2L, 1.0))) // directional: only 1→2
  }

  test("containment: exact dups emit both directions, threshold filters") {
    val c = Dedup.containmentPairs(docs, "id", "text", 3, 0.8, 100)
      .as[(Long, Long, Double)].collect().toSet
    // 1 and 4 are exact dups: contained both ways at 1.0;
    // 1 vs 2 share 6 of 7 trigrams: C = 6/7 ≈ 0.857 ≥ 0.8, both ways
    assert(c.contains((1L, 4L, 1.0)) && c.contains((4L, 1L, 1.0)))
    val c12 = c.filter(p => Set(p._1, p._2) == Set(1L, 2L))
    assert(c12.size == 2 && c12.forall(p => math.abs(p._3 - 6.0 / 7) < 1e-6))
    // a 0.9 bar keeps the exact dups (and 2/4's 6/7 pair drops out)
    val tight = Dedup.containmentPairs(docs, "id", "text", 3, 0.9, 100)
      .as[(Long, Long, Double)].collect().toSet
    assert(tight.forall(_._3 >= 0.9))
    assert(tight.contains((1L, 4L, 1.0)))
  }

  test("containment: stop-shingle cap only prunes candidates, never scores") {
    // cap=1 removes all shared trigrams from candidate gen for docs
    // 1/2/4 (each shared trigram has df>=2) → no pairs survive; but any
    // pair that DOES survive a cap must carry the exact full-set score
    val tight = Dedup.containmentPairs(docs, "id", "text", 3, 0.8, 1)
      .as[(Long, Long, Double)].collect().toSet
    val loose = Dedup.containmentPairs(docs, "id", "text", 3, 0.8, 100)
      .as[(Long, Long, Double)].collect().toSet
    assert(tight.subsetOf(loose))
  }

  test("minhash+LSH pairs ⊆ exact pairs, equal on high-sim corpus") {
    for (portable <- Seq(false, true)) {
      val exact = Dedup.ngramJaccardPairs(docs, "id", "text", 3, 0.5)
        .as[(Long, Long, Double)].collect().toSet
      val lsh = Dedup.minHashPairs(docs, "id", "text",
        portable = portable).as[(Long, Long, Double)].collect().toSet
      assert(lsh.subsetOf(exact))
      assert(lsh.map(p => (p._1, p._2)) == exact.map(p => (p._1, p._2)))
    }
  }

  test("property (seeded random): jaccard matches set-arithmetic brute force") {
    val rnd = new scala.util.Random(5)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val corpus = Seq.tabulate(30)(i =>
      (i.toLong, Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    val got = Dedup.ngramJaccardPairs(corpus.toDF("id", "text"), "id", "text", 2, 0.0)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    def shingleSet(t: String): Set[String] = {
      val toks = t.split("\\s+").toSeq
      if (toks.length < 2) Set(toks.mkString(" "))
      else toks.sliding(2).map(_.mkString(" ")).toSet
    }
    for ((ia, ta) <- corpus; (ib, tb) <- corpus if ia < ib) {
      val (sa, sb) = (shingleSet(ta), shingleSet(tb))
      val inter = (sa & sb).size
      if (inter > 0) {
        val expected = inter.toDouble / (sa.size + sb.size - inter)
        assert(math.abs(got((ia, ib)) - expected) < 1e-12, s"pair $ia,$ib")
      } else assert(!got.contains((ia, ib)))
    }
  }

  test("minhash signatures are deterministic across runs") {
    val a = Dedup.minHashSignatures(docs, "id", "text").collect().toSeq
    val b = Dedup.minHashSignatures(docs, "id", "text").collect().toSeq
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
  }

  test("simhash: exact dups at hamming 0; near-dups close; distinct far") {
    for (portable <- Seq(false, true)) {
      val sigs = Dedup.simHashSignatures(docs, "id", "text", portable = portable)
        .as[(Long, Long)].collect().toMap
      assert(sigs(1L) == sigs(4L))
      def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
      assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)))
      val pairs = Dedup.simHashPairs(docs, "id", "text",
        maxHamming = 3, portable = portable)
        .as[(Long, Long, Int)].collect()
      assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0))
    }
  }

  test("incremental LSH probe: new batch against a persisted index finds corpus dups") {
    val dir = java.nio.file.Files.createTempDirectory("lsh_ix").toString
    // "corpus" = docs 1-5; build + persist its banded index once
    val sigs = Dedup.withMinHashSignature(docs, "id", "text")
    Dedup.bandedSignatures(sigs, "id", bands = 16, rows = 4)
      .write.mode("overwrite").partitionBy("band_idx").parquet(dir)
    val index = spark.read.parquet(dir)
    // new batch: one near-dup of doc 1, one novel doc
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "totally novel words appear in this fresh document")
    ).toDF("id", "text")
    val batchBanded = Dedup.bandedSignatures(
      Dedup.withMinHashSignature(batch, "id", "text"), "id", 16, 4)
    val cands = Dedup.lshCandidatesAgainstIndex(batchBanded, index, "id")
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((100L, 1L)) && cands.contains((100L, 4L)))
    assert(!cands.exists(_._1 == 101L))
  }

  test("adaptiveBandShape: rows grow with log n at constant ~0.707 threshold") {
    // pinned values (the scale contract: 10x corpus must widen bands)
    assert(Dedup.adaptiveBandShape(500L) == (16, 4, 4))    // small = legacy 4x4
    assert(Dedup.adaptiveBandShape(5000L) == (16, 4, 4))
    assert(Dedup.adaptiveBandShape(50000L) == (48, 8, 6))  // 10x -> wider bands
    assert(Dedup.adaptiveBandShape(5000000L) == (128, 16, 8))
    assert(Dedup.adaptiveBandShape(Long.MaxValue) == (768, 64, 12)) // clamp
    // threshold (1/b)^(1/r) stays ~2^-1/2 for every shape
    Seq(500L, 50000L, 5000000L, Long.MaxValue).foreach { n =>
      val (_, b, r) = Dedup.adaptiveBandShape(n)
      val t = math.pow(1.0 / b, 1.0 / r)
      assert(math.abs(t - math.pow(2, -0.5)) < 1e-9, s"n=$n t=$t")
    }
  }

  test("cappedBandPairs: caps per-bucket pairs, preserves anchor connectivity, counts drops") {
    // one bucket of 6 ids, one of 2: cap=2 keeps C(2,2)+2*4=9 and 1
    // pairs, drops C(4,2)=6 from the big bucket only
    val banded = ((1L to 6L).map(i => (i, 0, "bucketA")) ++
      Seq((10L, 0, "bucketB"), (11L, 0, "bucketB")))
      .toDF("id", "band_idx", "band_hash")
    val pairs = Dedup.cappedBandPairs(banded, "id", maxBucket = 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs.size == 10, s"got ${pairs.size}: $pairs")
    // every member of bucketA still links to anchor id=1
    (2L to 6L).foreach(i => assert(pairs.contains((1L, i)), s"1-$i missing"))
    assert(pairs.contains((10L, 11L)))
    // no non-anchor pair survives
    assert(!pairs.contains((3L, 4L)))
    assert(Dedup.cappedBandDropped(banded, 2) == 6L)
    // cap >= bucket size = exact: identical to the uncapped self-join
    val uncapped = banded.alias("x").join(banded.alias("y"),
        $"x.band_idx" === $"y.band_idx" &&
          $"x.band_hash" === $"y.band_hash" && $"x.id" < $"y.id")
      .select($"x.id", $"y.id").as[(Long, Long)].collect().toSet
    val capped6 = Dedup.cappedBandPairs(banded, "id", maxBucket = 6)
      .as[(Long, Long)].collect().toSet
    assert(capped6 == uncapped)
    assert(Dedup.cappedBandDropped(banded, 6) == 0L)
  }
}
