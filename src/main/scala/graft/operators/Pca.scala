package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column, built the
  * way every trained model in this engine is built (q127 k-means, PQ
  * codebooks): a DETERMINISTIC distributed sufficient-statistics pass,
  * a bounded driver-side solve, and scan-side model-literal
  * projection.
  *
  *  - Pass 1 (distributed, the only corpus touch): embeddings are
  *    lifted to exact fixed-point longs (scale 1e4 — products ≤ ~3e7,
  *    so even 10^11 rows stay inside int64) and one mergeable
  *    [[GramAgg]] aggregation produces count, per-dim sums, and the
  *    upper-triangular sum of outer products. Integer sums are
  *    partition-order-free, so the MODEL is a pure function of the
  *    input set — retries, AQE re-plans, and cluster layout cannot
  *    change it.
  *  - Driver solve (64×64 = bounded metadata, NOT a data-path
  *    collect): covariance from the exact sums, then power iteration
  *    with deflation — deterministic start (unit vector on the
  *    largest-variance axis), fixed iteration count, no randomness.
  *  - Projection: pc_k(x) = dot(x, v_k) − dot(mean, v_k), with v_k and
  *    the scalar offset embedded as literals — zero joins, zero
  *    shuffles, whole-stage-codegen'd via
  *    [[graft.functions.VectorDot]], and replayable in ANSI SQL by
  *    construction (`list_dot_product(x, [v…]) − c`).
  *
  * At 100 TB: pass 1 is one map-side-combined aggregation (one
  * 17 KB buffer per task); everything after is free.
  */
object Pca {

  val Scale = 10000L // fixed-point lift: 1e4 ≈ 4 decimal digits

  /** Trained model: per-dim mean (descaled doubles) and the top
    * `nComponents` eigenpairs of the covariance matrix, eigenvalue
    * descending. Eigenvectors are unit-norm; sign is fixed by the
    * deterministic solve. */
  final case class PcaModel(
      n: Long, mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]]) {
    /** Scalar offset dot(mean, v_k) — precomputed so projection is a
      * single dot product per component. */
    def offset(k: Int): Double = {
      val v = components(k)
      var s = 0.0
      var i = 0
      while (i < v.length) { s += mean(i) * v(i); i += 1 }
      s
    }
  }

  private def triSize(d: Int): Int = d * (d + 1) / 2

  /** Mergeable exact sufficient statistics: buffer =
    * [count, sum_0..sum_{d-1}, upper-tri outer-product sums]. */
  class GramAgg(d: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    private val len = 1 + d + triSize(d)
    override def zero: Array[Long] = new Array[Long](len)
    override def reduce(acc: Array[Long], v: Array[Long]): Array[Long] = {
      require(v.length == d, s"expected dim $d, got ${v.length}")
      acc(0) += 1L
      var i = 0
      var t = 1 + d
      while (i < d) {
        acc(1 + i) += v(i)
        var j = i
        while (j < d) { acc(t) += v(i) * v(j); t += 1; j += 1 }
        i += 1
      }
      acc
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < len) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(s: Array[Long]): Array[Long] = s
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Exact fixed-point lift of a float vector column. */
  def quantized(vec: Column): Column =
    transform(vec.cast("array<double>"),
      x => round(x * Scale).cast("long"))

  /** Train: one distributed pass + driver-side eigensolve. The same
    * pass also computes max|q|, and the int64 headroom of the Gram
    * sums is CHECKED against it — embeddings outside the assumed ~unit
    * range (or an enormous n·max² product) would overflow the
    * outer-product accumulators silently and train a wrong model; now
    * they fail loudly with the measured magnitude. max() is immune to
    * the overflow it guards against, so the post-pass check is sound. */
  def fit(df: DataFrame, vecCol: String, d: Int, nComponents: Int,
      iters: Int = 100): PcaModel = {
    require(nComponents >= 1 && nComponents <= d)
    val agg = udaf(new GramAgg(d), ExpressionEncoder[Array[Long]]())
    val row = df
      .select(quantized(col(vecCol)).as("__q"))
      .agg(agg(col("__q")).as("s"),
        max(array_max(transform(col("__q"), x => abs(x)))).as("qmax"))
      .head
    val stats = row.getSeq[Long](0).toArray
    val n = stats(0)
    require(n > 0, "Pca.fit on an empty input")
    val qmax = if (row.isNullAt(1)) 0L else row.getLong(1)
    // every tri-sum cell accumulates at most n·qmax² in magnitude;
    // demand 4x headroom below Long.MaxValue so per-row adds can't
    // tip a near-full accumulator either
    if (qmax > 0)
      require(qmax <= math.sqrt(Long.MaxValue.toDouble / 4.0 / n),
        s"Pca.fit int64 headroom exceeded: max|quantized| = $qmax over " +
          s"n = $n rows (limit ${math.sqrt(Long.MaxValue.toDouble / 4.0 / n).toLong}); " +
          "rescale the embeddings (assumed ~unit range) or lower Pca.Scale")
    val s = Scale.toDouble
    val mean = Array.tabulate(d)(i => stats(1 + i).toDouble / n / s)
    // cov[i][j] = E[xy] − E[x]E[y] (population covariance), descaled
    val cov = Array.ofDim[Double](d, d)
    var t = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val exy = stats(t).toDouble / n / (s * s)
        val c = exy - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    // power iteration with deflation — all driver-side double math,
    // single-threaded, deterministic
    val comps = Array.ofDim[Double](nComponents, d)
    val evs = new Array[Double](nComponents)
    val a = cov.map(_.clone())
    var k = 0
    while (k < nComponents) {
      // deterministic start: unit vector on the largest remaining
      // diagonal (never orthogonal to the dominant eigenvector of a
      // PSD matrix unless that axis has zero loading — then the next
      // iterations still converge from accumulated components)
      var best = 0
      var bi = 1
      while (bi < d) { if (a(bi)(bi) > a(best)(best)) best = bi; bi += 1 }
      var v = Array.tabulate(d)(i => if (i == best) 1.0 else 0.0)
      var it = 0
      while (it < iters) {
        val w = new Array[Double](d)
        var r = 0
        while (r < d) {
          var c = 0
          var acc = 0.0
          while (c < d) { acc += a(r)(c) * v(c); c += 1 }
          w(r) = acc; r += 1
        }
        var nrm = 0.0
        var q = 0
        while (q < d) { nrm += w(q) * w(q); q += 1 }
        nrm = math.sqrt(nrm)
        if (nrm == 0.0) { it = iters } // zero matrix: keep v as-is
        else {
          var z = 0
          while (z < d) { w(z) /= nrm; z += 1 }
          v = w
          it += 1
        }
      }
      // sign convention: largest-|coordinate| entry positive
      var mi = 0
      var mz = 1
      while (mz < d) { if (math.abs(v(mz)) > math.abs(v(mi))) mi = mz; mz += 1 }
      if (v(mi) < 0) { var z = 0; while (z < d) { v(z) = -v(z); z += 1 } }
      // Rayleigh quotient = eigenvalue for the converged vector
      var ev = 0.0
      var r2 = 0
      while (r2 < d) {
        var c2 = 0
        var acc = 0.0
        while (c2 < d) { acc += a(r2)(c2) * v(c2); c2 += 1 }
        ev += v(r2) * acc; r2 += 1
      }
      comps(k) = v
      evs(k) = ev
      // deflate: A ← A − λ v vᵀ
      var dr = 0
      while (dr < d) {
        var dc = 0
        while (dc < d) { a(dr)(dc) -= ev * v(dr) * v(dc); dc += 1 }
        dr += 1
      }
      k += 1
    }
    PcaModel(n, mean, evs, comps)
  }

  /** Scan-side projection of component k: model-literal dot minus the
    * precomputed mean offset, rounded to the engine's 6 dp. */
  def project(vec: Column, model: PcaModel, k: Int): Column = {
    val v = array(model.components(k).map(lit(_)): _*)
    Similarity.round6(
      Similarity.dot(vec.cast("array<double>"), v) - lit(model.offset(k)))
  }

  /** SQL twin of [[project]] — same literals, same op order. */
  def projectSql(vecExpr: String, model: PcaModel, k: Int): String = {
    val v = model.components(k).map(_.toString).mkString("[", ",", "]")
    s"round(list_dot_product($vecExpr, $v::DOUBLE[]) - ${model.offset(k)}, 6)"
  }
}
