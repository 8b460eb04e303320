package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f, 0.0f), 0),
    (3L, Array(0.0f, 1.0f, 0.0f), 1),
    (4L, Array(0.0f, 0.0f, 1.0f), 1),
    (5L, Array(-1.0f, 0.0f, 0.0f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("cosine: orthogonal 0, identical 1, opposite -1") {
    val r = vecs.alias("a").join(vecs.alias("b"))
      .select($"a.vec_id", $"b.vec_id",
        round(Similarity.cosine($"a.embedding", $"b.embedding"), 9).as("c"))
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(r((1L, 1L)) == 1.0)
    assert(r((1L, 3L)) == 0.0)
    assert(r((1L, 5L)) == -1.0)
  }

  test("bruteForceTopK ranks nearest first, excludes self") {
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1L),
      "vec_id", "embedding", k = 2)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    assert(top.map(_._2).toSeq == Seq(2L, 3L))
    assert(top.forall(_._1 == 1L))
  }

  test("ivfTopK only probes the query's cluster") {
    val top = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 3L),
      "vec_id", "embedding", "label", k = 3)
      .as[(Long, Long, Int, Double)].collect()
    assert(top.map(_._2).toSet == Set(4L)) // only other label-1 vector
  }

  test("hyperplane bucket: deterministic, colinear vectors collide") {
    val b = vecs.select($"vec_id",
      Similarity.hyperplaneBucket($"embedding", dim = 3, nBits = 8).as("bucket"))
      .as[(Long, Long)].collect().toMap
    val b2 = vecs.select($"vec_id",
      Similarity.hyperplaneBucket($"embedding", dim = 3, nBits = 8).as("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(b == b2)
    def ham(a: Long, c: Long) = java.lang.Long.bitCount(a ^ c)
    assert(ham(b(1L), b(2L)) <= 2) // nearly colinear → most signs agree
    assert(b(5L) == (~b(1L) & 0xFFL)) // opposite vector → every sign flips
    assert(ham(b(1L), b(3L)) > 0) // orthogonal → some differ (seed-checked)
  }

  test("multi-probe IVF: nprobe=all clusters equals brute force") {
    val queries = vecs.filter($"vec_id" <= 2)
    val brute = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    val probedAll = Similarity.ivfTopKProbed(vecs, queries,
      "vec_id", "embedding", "label", k = 3, nprobe = 2) // 2 = all clusters
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(probedAll == brute)
    // nprobe=1 returns a subset of the probed clusters' members only
    val probed1 = Similarity.ivfTopKProbed(vecs, queries,
      "vec_id", "embedding", "label", k = 3, nprobe = 1)
      .as[(Long, Long, Int, Double)].collect()
    assert(probed1.nonEmpty)
    assert(probed1.map(_._2).toSet.subsetOf(vecs.as[(Long, Array[Float], Int)]
      .collect().map(_._1).toSet))
  }

  test("blockedNearDupPairs verifies within blocks only") {
    val pairs = Similarity.blockedNearDupPairs(vecs, "vec_id", "embedding",
      col("label"), minSim = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
  }

  test("knnGraphBlocked: every node gets its in-block top-k, both directions") {
    val g = Similarity.knnGraphBlocked(vecs, "vec_id", "embedding",
      col("label"), k = 1)
      .as[(Long, Long, Int, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    // block 0 = {1,2,5}: 1↔2 are nearest; 5 points at 2 (cos -0.9939 vs
    // -1.0 for vec 1); block 1 = {3,4}: mutual orthogonal neighbors
    assert(g == Map(1L -> 2L, 2L -> 1L, 5L -> 2L, 3L -> 4L, 4L -> 3L))
  }

  test("adaptiveHyperplaneBits scales bucket count with corpus, clamped") {
    // bits ≈ log2(n / target): buckets track n, candidate volume ~linear
    assert(Similarity.adaptiveHyperplaneBits(500) == 5)
    assert(Similarity.adaptiveHyperplaneBits(5000) == 9)
    assert(Similarity.adaptiveHyperplaneBits(50000) == 12)
    assert(Similarity.adaptiveHyperplaneBits(500000) == 15)
    assert(Similarity.adaptiveHyperplaneBits(1) == 4) // floor clamp
    assert(Similarity.adaptiveHyperplaneBits(Long.MaxValue) == 24) // cap
    // identical vectors collide at any width (exact-dup recall invariant)
    val twin = Seq((1L, Array(0.3f, -0.2f, 0.9f), 0),
      (2L, Array(0.3f, -0.2f, 0.9f), 0)).toDF("vec_id", "embedding", "label")
    Seq(4, 12, 24).foreach { bits =>
      val b = twin.select(
        Similarity.hyperplaneBucket($"embedding", dim = 3, nBits = bits))
        .as[Long].collect()
      assert(b(0) == b(1))
    }
  }

  test("semanticDedup keeps lowest id per similar group, blocks respected") {
    // cluster 0: 1~2 similar (cos ≈ 0.994), 5 opposite; cluster 1: 3⊥4
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      $"label", minSim = 0.8)
    assert(out.columns.toSeq == Seq("vec_id", "embedding", "label"))
    assert(out.select("vec_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 4L, 5L))
  }

  test("semanticDedup chain: drops are witnessed by ANY earlier row") {
    // a(0°) ~ b(20°) ~ c(40°) at τ=0.92: cos(a,c)=0.766 < τ, but c
    // still drops via the (dropped) b — one survivor per chain
    def at(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val chain = Seq((1L, at(0), 0), (2L, at(20), 0), (3L, at(40), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.semanticDedup(chain, "vec_id", "embedding",
      $"label", minSim = 0.92)
    assert(out.select("vec_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("semanticDedup: different blocks never dedup each other") {
    val twins = Seq((1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.semanticDedup(twins, "vec_id", "embedding",
      $"label", minSim = 0.9)
    assert(out.count() == 2)
  }

  test("scalarQuantize: elements bounded by 127, scale exact, zero vector safe") {
    val withZero = vecs.unionByName(
      Seq((6L, Array(0.0f, 0.0f, 0.0f), 2)).toDF("vec_id", "embedding", "label"))
    val q = Similarity.scalarQuantize(withZero, "vec_id", "embedding")
      .as[(Long, Array[Long], Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    q.values.foreach { case (qv, _) => qv.foreach(e => assert(math.abs(e) <= 127)) }
    // unit vector: scale 1/127, element exactly ±127
    assert(q(1L)._1.toSeq == Seq(127L, 0L, 0L))
    assert(q(5L)._1.toSeq == Seq(-127L, 0L, 0L))
    assert(q(1L)._2 == 1.0 / 127.0)
    // zero vector: zero qvec, zero scale, no NaN/failure
    assert(q(6L)._1.toSeq == Seq(0L, 0L, 0L) && q(6L)._2 == 0.0)
  }

  test("quantizedTopK agrees with exact brute force on well-separated vectors") {
    val exact = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1L),
      "vec_id", "embedding", k = 2)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3).map(_._2).toSeq
    val quant = Similarity.quantizedTopK(vecs, vecs.filter($"vec_id" === 1L),
      "vec_id", "embedding", k = 2)
      .as[(Long, Long, Int, Long)].collect().sortBy(_._3)
    assert(quant.map(_._2).toSeq == exact)
    // integer dot of two unit-x vectors: 127 * 127
    val self2 = Similarity.quantizedTopK(vecs, vecs.filter($"vec_id" === 5L),
      "vec_id", "embedding", k = 4)
      .as[(Long, Long, Int, Long)].collect()
      .map(r => r._2 -> r._4).toMap
    assert(self2(1L) == -127L * 127L)
  }

  test("kmeansAssign: near-dups share a cluster, separated groups split") {
    val assigned = Similarity.kmeansAssign(vecs, "vec_id", "embedding",
        k = 3, iters = 2)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    assert(assigned.values.forall(c => c >= 0 && c < 3))
    assert(assigned(1L) == assigned(2L)) // 0.9/0.1 neighbor of seed 1
    assert(assigned(1L) != assigned(3L)) // orthogonal axes split
    // deterministic under repartitioning (inherits the Lloyd pin)
    val again = Similarity.kmeansAssign(vecs.repartition(4), "vec_id",
        "embedding", k = 3, iters = 2)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    assert(again == assigned)
  }

  test("buildUnsupervised: IVF lifecycle works without a label column") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_unsup").toString
    IvfIndex.buildUnsupervised(vecs.drop("label"), "vec_id", "embedding",
      iters = 2, path = dir, k = 3)
    val idx = IvfIndex.load(spark, dir, "vec_id", "embedding", "cluster")
    val top = IvfIndex.topK(idx, vecs.filter($"vec_id" === 1L),
      k = 2, nprobe = 1)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    // vec 2 is in vec 1's own cluster and nearest
    assert(top.head._2 == 2L)
  }

  test("hardNegatives: only other-label vectors, nearest first") {
    val neg = Similarity.hardNegatives(vecs, vecs.filter($"vec_id" === 1L),
      "vec_id", "embedding", "label", k = 2)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    // label-0 anchor → candidates are 3 and 4 (label 1); both orthogonal
    // (sim 0.0) so ties break by id
    assert(neg.map(_._2).toSeq == Seq(3L, 4L))
    assert(neg.forall(_._4 == 0.0))
  }

  test("hardNegatives: null labels excluded on both sides") {
    val withNull = vecs.withColumn("label",
      when($"vec_id" === 3L, lit(null)).otherwise($"label"))
    val neg = Similarity.hardNegatives(withNull,
      withNull.filter($"vec_id" === 1L), "vec_id", "embedding", "label", k = 5)
      .as[(Long, Long, Int, Double)].collect()
    assert(!neg.map(_._2).contains(3L)) // unknown cluster ≠ provable negative
    // null-label anchor mines nothing
    val negNull = Similarity.hardNegatives(withNull,
      withNull.filter($"vec_id" === 3L), "vec_id", "embedding", "label", k = 5)
    assert(negNull.count() == 0)
  }

  test("hardNegatives property (seeded): matches per-anchor brute force") {
    val rnd = new scala.util.Random(41)
    val data = Seq.tabulate(200)(i => (i.toLong,
      Array.fill(8)(rnd.nextFloat() * 2 - 1), rnd.nextInt(6)))
    val df = data.toDF("vec_id", "embedding", "label").repartition(5)
    val got = Similarity.hardNegatives(df, df.filter($"vec_id" < 5),
      "vec_id", "embedding", "label", k = 3)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.zip(y).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      math.floor(d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b))) * 1e6 + 0.5) / 1e6
    }
    data.filter(_._1 < 5).foreach { case (qid, qv, ql) =>
      val expected = data.filter(_._3 != ql)
        .map(c => (c._1, cos(qv, c._2)))
        .sortBy { case (id, s) => (-s, id) }.take(3).map(_._1)
      assert(got(qid) == expected, s"anchor $qid")
    }
  }
}
