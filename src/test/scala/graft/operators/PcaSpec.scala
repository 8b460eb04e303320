package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic distributed PCA: exact Gram pass + driver eigensolve +
  * model-literal projection. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Anisotropic synthetic cloud: dominant axis u (variance ~9), weak
    * orthogonal axis w (variance ~1), tiny isotropic noise. */
  private def cloud(n: Int, d: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val u = Array.tabulate(d)(i => if (i == 2) 1.0 else 0.0)
    val w = Array.tabulate(d)(i => if (i == 7) 1.0 else 0.0)
    (0 until n).map { i =>
      val a = 3.0 * rnd.nextGaussian()
      val b = 1.0 * rnd.nextGaussian()
      val v = Array.tabulate(d)(j =>
        (a * u(j) + b * w(j) + 0.01 * rnd.nextGaussian()).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("fit recovers a dominant axis (unit norm, correct direction, ordered eigenvalues)") {
    val df = cloud(2000, 16, seed = 5)
    val m = Pca.fit(df, "embedding", d = 16, nComponents = 2, iters = 100)
    assert(m.n === 2000L)
    // unit norm
    m.components.foreach { v =>
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    }
    // v1 aligned with axis 2, v2 with axis 7
    assert(math.abs(m.components(0)(2)) > 0.99,
      s"v1=${m.components(0).mkString(",")}")
    assert(math.abs(m.components(1)(7)) > 0.99)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    assert(m.eigenvalues(0) > 7.0 && m.eigenvalues(0) < 11.0)
    // orthogonality
    val dot = m.components(0).zip(m.components(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-6)
  }

  test("model is partitioning-insensitive (exact integer Gram)") {
    val df = cloud(500, 8, seed = 9)
    val m1 = Pca.fit(df.repartition(1), "embedding", 8, 2, iters = 40)
    val m13 = Pca.fit(df.repartition(13), "embedding", 8, 2, iters = 40)
    assert(m1.mean.toSeq === m13.mean.toSeq)
    assert(m1.components(0).toSeq === m13.components(0).toSeq)
    assert(m1.components(1).toSeq === m13.components(1).toSeq)
    assert(m1.eigenvalues.toSeq === m13.eigenvalues.toSeq)
  }

  test("projection is centred: mean of pc over the corpus ~ 0") {
    val df = cloud(1000, 8, seed = 3)
    val m = Pca.fit(df, "embedding", 8, 1, iters = 60)
    val meanPc = df.select(Pca.project(col("embedding"), m, 0).as("pc"))
      .agg(avg(col("pc"))).head.getDouble(0)
    assert(math.abs(meanPc) < 1e-2) // 6-dp rounded projections
  }

  test("projection variance follows eigenvalue order") {
    val df = cloud(1000, 8, seed = 11)
    val m = Pca.fit(df, "embedding", 8, 2, iters = 60)
    val vars = df.select(
        Pca.project(col("embedding"), m, 0).as("p1"),
        Pca.project(col("embedding"), m, 1).as("p2"))
      .agg(var_pop(col("p1")), var_pop(col("p2"))).head
    assert(vars.getDouble(0) > vars.getDouble(1))
  }

  test("empty input is refused loudly") {
    val empty = cloud(5, 4, 1).filter(col("vec_id") < 0)
    intercept[IllegalArgumentException] {
      Pca.fit(empty, "embedding", 4, 1)
    }
  }

  test("int64 headroom guard: out-of-range magnitudes fail loudly, not wrongly") {
    // |x| = 1e6 quantizes to 1e10; squared products blow int64 within
    // a handful of rows -- the old code trained a silently-wrong model
    val big = cloud(50, 4, seed = 5)
      .select(col("vec_id"),
        transform(col("embedding"), x => x * 1e6f).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Pca.fit(big, "embedding", 4, 1, iters = 10)
    }
    assert(e.getMessage.contains("headroom"))
    // in-range magnitudes still train fine (the guard has no false fire)
    val m = Pca.fit(cloud(50, 4, seed = 5), "embedding", 4, 1, iters = 10)
    assert(m.n === 50)
  }
}
