package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for ANN at compression ratios scalar
  * quantization can't reach: each vector splits into `m` subvectors,
  * each coded as ONE of `k` codewords in its subspace's codebook →
  * m·log₂(k) bits per vector (64 float dims = 256 B → 4 nibble codes
  * at m=4, k=16). Queries score against codes with an asymmetric-
  * distance LUT: the query side stays exact, only the corpus is
  * quantized — the standard memory layout under billion-vector ANN
  * (IVF for the scan cut, PQ for the byte cut; compose with
  * [[IvfIndex]] by encoding within clusters).
  *
  * Codebooks are DETERMINISTIC: subspace s's codewords are the
  * subvectors of the k lowest-id corpus vectors (k-means "first-k"
  * seeding, no Lloyd iterations — a Lloyd step needs float-mean
  * aggregations whose summation order is partition-dependent, which
  * would break cross-engine replay and resumability; refine offline if
  * recall matters and feed the refined book back in as literals). The
  * trained book is collected to the driver (m·k·subdim doubles — KBs,
  * the [[Similarity.hyperplanes]] constant pattern) and inlined as
  * literals, so encoding and LUT scoring are per-row codegen'd
  * expressions: ZERO joins and ZERO shuffles on the corpus side.
  */
object ProductQuant {

  /** Codebooks: `m` subspaces × `k` codewords, codeword c of subspace s
    * = dims [s·sub, (s+1)·sub) of the (c+1)-th lowest-id corpus vector
    * whose id is divisible by `seedStride`. Driver-side collect of k
    * rows — bounded and intended.
    *
    * `seedStride` exists because first-k seeding (stride 1, the
    * replay-stable default every oracle-gated query pins) DEGENERATES
    * when ids correlate with content: on the 1M ivfpqscale corpus
    * (20-member groups in consecutive ids) the first 256 seeds cover
    * only ~13 distinct neighborhoods, duplicate seeds tie-break to the
    * lower code, the rest of the book starts empty and Lloyd's
    * keep-empty-cells rule can never revive it — measured 0.00 top-10
    * overlap at ANY code budget. Stride ≈ n/k spreads the seeds across
    * the id range while staying deterministic and SQL-replayable
    * (`WHERE id % stride = 0 ORDER BY id LIMIT k` — q145 pins it). */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, seedStride: Long = 1L): Seq[Seq[Array[Double]]] = {
    require(seedStride >= 1L, s"seedStride $seedStride")
    val pool =
      if (seedStride == 1L) corpus
      else corpus.filter(pmod(col(idCol), lit(seedStride)) === 0)
    val seeds = pool
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .orderBy(col(idCol)).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(seeds.length == k,
      s"corpus has < $k rows to seed codebooks at stride $seedStride")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    (0 until m).map(s => seeds.toSeq.map(_.slice(s * sub, (s + 1) * sub)))
  }

  /** Lloyd-refined codebooks: `iters` fixed k-means steps over the
    * first-k seeds (r7's q106 measured first-k recall at 0/5 for 4 of
    * 20 queries — seeding alone is not production recall). Each step
    * re-assigns every subvector to its nearest codeword (same argmin +
    * tie-break as [[encode]]) and recenters each codeword on its
    * members' mean. Determinism under Spark's partition-order-dependent
    * float summation comes from the same fixed-point trick the integer
    * PageRank/EWMA paths use: per-dimension sums are EXACT integer sums
    * of `floor(v·10⁶ + 0.5)`-quantized values (associative, order-free),
    * and the centroid is `Σq / (n·10⁶)` — one double division both
    * engines land identically, so the refined books inline as identical
    * literals and the whole pipeline stays engine-replayable. Empty
    * clusters keep their previous codeword. Per iteration: one
    * scan-side assignment + one (s, code, dim) aggregation whose output
    * is m·k·subdim rows — KBs collected, the [[trainCodebooks]]
    * pattern; cache the corpus upstream if iterating at scale. */
  def trainCodebooksLloyd(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int,
      seedStride: Long = 1L): Seq[Seq[Array[Double]]] = {
    var books = trainCodebooks(corpus, idCol, vecCol, m, k, seedStride)
    if (iters <= 0) return books
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val sub = books.head.head.length
    val base = corpus
      .select(col(vecCol).cast("array<double>").as("__v"))
      .select((0 until m).map(s =>
        slice(col("__v"), s * sub + 1, sub).as(s"__s$s")): _*)
    (1 to iters).foreach { _ =>
      val assigned = base.select((0 until m).map(s => struct(
        nearestCode(col(s"__s$s"), books(s)).as("code"),
        col(s"__s$s").as("sv")).as(s"__a$s")): _*)
      val sums = assigned
        .select(explode(array((0 until m).map(s =>
          struct(lit(s).as("s"), col(s"__a$s").getField("code").as("code"),
            col(s"__a$s").getField("sv").as("sv"))): _*)).as("e"))
        .select(col("e.s").as("s"), col("e.code").as("code"),
          posexplode(col("e.sv")).as(Seq("dim", "val")))
        .groupBy(col("s"), col("code"), col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("val") * lit(1e6) + lit(0.5)).cast("long")).as("sq"))
        .collect()
      val byCluster = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
      books = (0 until m).map { s =>
        (0 until k).map { code =>
          byCluster.get((s, code)) match {
            case Some(rows) =>
              val arr = new Array[Double](sub)
              rows.foreach { r =>
                arr(r.getInt(2)) =
                  r.getLong(4).toDouble / (r.getLong(3).toDouble * 1e6)
              }
              arr
            case None => books(s)(code)
          }
        }
      }
    }
    books
  }

  private[operators] def litArray(a: Array[Double]): Column =
    array(a.toSeq.map(lit): _*)

  /** Exact left-fold Σx² — the same association order as
    * [[Similarity.dot]]'s column fold and DuckDB's list_dot_product,
    * so the inlined constant replays bit-for-bit. */
  private[operators] def norm2(a: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * a(i); i += 1 }
    acc
  }

  /** Per-codeword scores for one subvector column: ‖cw‖² − 2·⟨sv,cw⟩
    * (the ‖sv‖² term is constant across codewords — dropped in BOTH
    * engines so ties break identically). One array of k score
    * expressions, each referenced exactly once — a when-chain argmin
    * would embed its accumulator twice per step and blow the
    * expression tree up to 2^k nodes (measured: analysis alone spun
    * for minutes at k=16). For the SCAN-side argmin use [[nearestCode]]
    * instead: this literal form still emits O(k·subdim) expression
    * nodes, which blows janino's 64 KB method limit at m=8/k=256 (the
    * whole encode stage then runs interpreted) — it survives only
    * where the full score VECTOR is needed on a handful of rows
    * (multi-probe query routing). */
  private[operators] def scoreArray(sv: Column, cws: Seq[Array[Double]]): Column =
    array(cws.map(cw =>
      lit(norm2(cw)) - lit(2.0) * Similarity.dot(sv, litArray(cw))): _*)

  /** First-minimum codeword index for one subvector column — the
    * codegen'd [[graft.functions.PqNearestCode]] loop (codebook as a
    * reference object: constant code size at any k), bit-identical to
    * `array_position(scoreArray(..), array_min(scoreArray(..))) - 1`. */
  private[operators] def nearestCode(sv: Column, cws: Seq[Array[Double]]): Column =
    graft.functions.VectorFunctions.nearestCode(sv, cws)

  /** (id, __c0 … __c{m-1}) PQ codes for every corpus row — a pure
    * per-row projection (scan-side, no shuffle). code = index of the
    * FIRST minimum score (array_position finds the first equal
    * element, so the earliest codeword wins ties — the same order the
    * oracle's `row_number ... ORDER BY score, code` picks). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      books: Seq[Seq[Array[Double]]]): DataFrame = {
    // every public vector entry point registers its own functions —
    // callers composing encode() without pqTopK() must not crash on
    // an unregistered graft_vector_dot (the r5 lesson)
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val m = books.length
    val sub = books.head.head.length
    corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .select(col(idCol) +: (0 until m).map(s =>
        slice(col("__v"), s * sub + 1, sub).as(s"__s$s")): _*)
      .select(col(idCol) +: (0 until m).map(s =>
        nearestCode(col(s"__s$s"), books(s)).as(s"__c$s")): _*)
  }

  /** ADC top-k: per query, one LUT array per subspace (k dots against
    * the literal book — computed ONCE per query row, broadcast), then
    * the corpus scan scores each coded row with m array lookups and a
    * fixed-order m-term sum. Approximate dot = Σ_s ⟨qv_s, cw[code_s]⟩;
    * ranking ties break on the 6-dp rounded score then id, so results
    * hash-replay exactly. */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, m: Int, k: Int, topK: Int,
      queryIdCol: String = "query_id", lloydIters: Int = 0,
      seedStride: Long = 1L): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val books = trainCodebooksLloyd(corpus, idCol, vecCol, m, k,
      lloydIters, seedStride)
    val sub = books.head.head.length
    val coded = encode(corpus, idCol, vecCol, books)
    val q = broadcast(queries
      .select(col(idCol).as(queryIdCol),
        col(vecCol).cast("array<double>").as("__v"))
      .select(col(queryIdCol) +: (0 until m).map(s =>
        slice(col("__v"), s * sub + 1, sub).as(s"__qs$s")): _*)
      .select(col(queryIdCol) +: (0 until m).map(s =>
        array(books(s).map(cw =>
          Similarity.dot(col(s"__qs$s"), litArray(cw))): _*).as(s"__lut$s")): _*))
    val scored = coded.join(q, col(queryIdCol) =!= col(idCol))
      .withColumn("approx_score",
        round((0 until m).map(s =>
          element_at(col(s"__lut$s"), col(s"__c$s") + 1)).reduce(_ + _), 6))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("approx_score").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"),
        col("rank"), col("approx_score"))
  }
}
