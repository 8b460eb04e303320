package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated equivalences the paired implementations must
  * hold exactly:
  *  - star contraction ≡ min-label propagation on arbitrary graphs
  *    (self-loops, duplicate and reversed edges, disconnected bits);
  *  - the incremental LSH index probe emits exactly the batch-LSH
  *    candidate pairs that cross the (new, indexed) boundary — no
  *    recall loss from indexing.
  */
class EquivalencePropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (0 until n).map { _ =>
      val v = g.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      v
    }
  }

  test("star contraction ≡ min-label propagation on random graphs") {
    val gEdges = for {
      n <- Gen.choose(5, 50)
      m <- Gen.choose(1, 100)
      es <- Gen.listOfN(m,
        Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield es
    samples(gEdges, 6, 42L).zipWithIndex.foreach { case (es, trial) =>
      val df = es.toDF("a", "b")
      val prop = Components.connectedComponents(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      val star = Components.connectedComponentsStar(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(star == prop, s"trial $trial diverged on edges: $es")
    }
  }

  test("incremental LSH probe ⊇ (and =) batch LSH pairs crossing the index") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val gCorpus = for {
      n <- Gen.choose(20, 50)
      texts <- Gen.listOfN(n, for {
        len <- Gen.choose(3, 12)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield ws.mkString(" "))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    samples(gCorpus, 4, 7L).zipWithIndex.foreach { case (docs, trial) =>
      val df = docs.toDF("id", "text")
      val sigs = Dedup.withMinHashSignature(df, "id", "text",
        shingleN = 3, numHashes = 16, seed = 42L)
      val banded = Dedup.bandedSignatures(sigs, "id", bands = 4, rows = 4)
      // index = even ids (the persisted corpus), batch = odd ids
      val inc = Dedup.lshCandidatesAgainstIndex(
          banded.filter(pmod(col("id"), lit(2)) === 1),
          banded.filter(pmod(col("id"), lit(2)) === 0), "id")
        .as[(Long, Long)].collect()
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      val crossFull = Dedup.lshCandidatePairs(sigs, "id", bands = 4, rows = 4)
        .as[(Long, Long)].collect()
        .filter { case (a, b) => (a + b) % 2 == 1 } // one even, one odd
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      assert(crossFull.subsetOf(inc),
        s"trial $trial: probe missed ${crossFull -- inc}")
      assert(inc == crossFull,
        s"trial $trial: probe emitted extras ${inc -- crossFull}")
    }
  }
}
