package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: reference-model parity, the cycle fixed
  * point, sink handling, and partition-layout invariance (the integer
  * arithmetic is order-free by construction — prove it). */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  /** In-test reference: the same scaled-integer recurrence, computed
    * sequentially. */
  private def refRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters)
      r = nodes.map { n =>
        val in = edges.filter(_._2 == n)
          .map { case (s, _) => r(s) / out(s) }.sum
        n -> (150000L + 85L * in / 100L)
      }.toMap
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    GraphRank.pageRankScaled(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("a cycle is a fixed point at exactly `scale`") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(run(cycle, 4) === Map(1L -> 1000000L, 2L -> 1000000L,
      3L -> 1000000L))
  }

  test("sink holds the teleport floor; its source decays toward it") {
    val m = run(Seq((1L, 2L)), 3)
    assert(m(1L) === 150000L)
    assert(m(2L) === 277500L) // 150000 + 85% of the teleport-only source
  }

  test("reference parity on a random graph (with a hub and a sink)") {
    val rnd = new scala.util.Random(5)
    val edges = (Seq.tabulate(40)(i => (i.toLong % 10, (i * 7 % 11).toLong))
      ++ Seq.tabulate(8)(i => (i.toLong, 99L)))  // 99 is a pure sink
      .filter { case (s, t) => s != t }.distinct
    assert(run(edges, 3) === refRank(edges, 3))
  }

  test("partition layout does not change a single rank unit") {
    val rnd = new scala.util.Random(17)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (s, t) => s != t }.distinct
    val base = run(edges, 3)
    val shuffled = GraphRank.pageRankScaled(
      scala.util.Random.shuffle(edges).toDF("src", "dst").repartition(7),
      "src", "dst", 3).as[(Long, Long)].collect().toMap
    assert(base === shuffled)
    assert(base === refRank(edges, 3))
  }

  test("triangleStats: square+diagonal counts exactly; direction/dup/self-loop safe") {
    // 1-2-3-4-1 plus diagonal 1-3: triangles {1,2,3} and {1,3,4};
    // degrees 3,2,3,2 → wedges 3+1+3+1 = 8; cc = 3·2/8 = 0.75
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      // reversed duplicates and a self loop must not change anything
      (2L, 1L), (3L, 1L), (4L, 4L))
    val r = GraphRank.triangleStats(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((5L, 8L, 2L, 750000L)))
  }

  test("sampledTriangleEstimate: deterministic subset, exact scaling") {
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (s, t) => s != t }.distinct
    def run(df: org.apache.spark.sql.DataFrame) =
      GraphRank.sampledTriangleEstimate(df, "src", "dst", invP = 2,
        seed = 7L).as[(Long, Long, Long)].head()
    val a = run(edges.toDF("src", "dst"))
    // partitioning/order-invariant (hash sampling, no RNG stream)
    val b = run(scala.util.Random.shuffle(edges).toDF("src", "dst")
      .repartition(7))
    assert(a == b)
    // estimate is exactly the sampled count × invP³
    assert(a._3 == a._2 * 8)
    // p=1/2 keeps roughly half the edges
    val und = edges.map { case (s, t) => (math.min(s, t), math.max(s, t)) }
      .distinct.size
    assert(a._1 > und / 4 && a._1 < und * 3 / 4, s"kept ${a._1} of $und")
    intercept[IllegalArgumentException] {
      GraphRank.sampledTriangleEstimate(edges.toDF("src", "dst"),
        "src", "dst", invP = 1, seed = 7L)
    }
  }

  test("triangleStats: brute-force parity on a random graph with a hub") {
    val rnd = new scala.util.Random(11)
    val edges = (Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      ++ (1L to 20L).map(i => (0L, i)))  // node 0 is a hub
      .filter { case (s, t) => s != t }.distinct
    val und = edges.map { case (s, t) => (math.min(s, t), math.max(s, t)) }
      .distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = (for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } yield 1).size.toLong
    val r = GraphRank.triangleStats(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Long)].head()
    assert(r._3 == brute)
    assert(r._1 == und.size.toLong)
  }
}
