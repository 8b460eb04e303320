package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force union-find reference. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("two triangles joined by a bridge plus an isolated edge") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val got = Components.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chain converges (diameter > 2 rounds)") {
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Components.connectedComponents(chain, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 20 && got.values.forall(_ == 1L))
  }

  test("random graphs match union-find") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      val got = Components.connectedComponents(
        edges.toDF("a", "b"), "a", "b").as[(Long, Long)].collect().toMap
      assert(got == ufComponents(edges), s"trial $trial")
    }
  }

  test("star contraction matches union-find on random graphs (incl. self-loops)") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 5) {
      val edges = Seq.fill(40)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      val got = Components.connectedComponentsStar(
        edges.toDF("a", "b"), "a", "b").as[(Long, Long)].collect().toMap
      assert(got == ufComponents(edges), s"trial $trial")
    }
  }

  test("star contraction resolves a 200-chain in far fewer than 200 rounds") {
    // min-label propagation needs ~200 rounds here; star contraction's
    // maxIter=30 default would fail unless it genuinely converges in
    // O(log² n) alternations
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Components.connectedComponentsStar(chain, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 200 && got.values.forall(_ == 1L))
  }

  test("dropNearDuplicates keeps one representative per cluster and all singletons") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(i => (i, s"doc$i")).toDF("id", "text")
    val pairs = Seq((2L, 4L), (4L, 6L), (3L, 5L)).toDF("id_a", "id_b")
    val kept = Components.dropNearDuplicates(docs, "id", pairs)
      .select($"id").as[Long].collect().toSet
    // clusters {2,4,6}→2 and {3,5}→3; 1 untouched
    assert(kept == Set(1L, 2L, 3L))
  }
}
