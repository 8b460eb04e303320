package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * score every corpus vector scan-side, per-query top-k via window.
  * Scale path: partitioned (IVF-style) search — restrict scoring to the
  * query's coarse cluster(s); and random-hyperplane LSH bucketing.
  * Scoring runs through the codegen'd [[graft.functions.VectorDot]]
  * expression (registered per session); [[dotHof]] is the pure-builtin
  * fallback with identical bit-level semantics.
  */
object Similarity {

  /** Dot product in double precision via the native expression. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot(a, b)

  /** Same fold with builtin higher-order functions only (interpreted —
    * ~5× slower per pair; kept as the zero-registration path and as the
    * semantic reference for tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** The engine's 6-dp similarity round — bit-equal to `round6(c)`
    * via the codegen'd [[graft.functions.FastRound]] (Spark's Round on
    * doubles is one BigDecimal round-trip PER ROW; measured ~7s of an
    * 11s 40M-pair scoring pass on the q84 shape, it was the hottest
    * instruction in every similarity pipeline). */
  def round6(c: Column): Column = graft.functions.FastRound.round6(c)

  /** Brute-force top-k: queries × corpus scored via broadcast
    * nested-loop join (no shuffle of the corpus), then per-query top-k.
    * Norms are precomputed per row on both sides — O(corpus + queries)
    * norm evaluations instead of O(pairs), the difference between one
    * extra scan column and a quadratic recompute at 100 TB.
    * Similarity is rounded so downstream rank ties break identically on
    * any engine; exact FP noise below 1e-6 never reorders results.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      queryIdCol: String = "query_id"): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val q = broadcast(queries.select(
      col(idCol).as(queryIdCol), col(vecCol).as("__qvec"),
      norm(col(vecCol)).as("__qnorm")))
    val c = corpus.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("__cnorm"))
    val scored = c.join(q, col(queryIdCol) =!= col(idCol))
      .withColumn("similarity",
        round6(dot(col("__qvec"), col(vecCol)) / (col("__qnorm") * col("__cnorm"))))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("similarity").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"),
        col("rank"), col("similarity"))
  }

  /** Hard-negative mining for embedding-model training: for each anchor,
    * the k most cosine-similar corpus vectors from a DIFFERENT
    * `labelCol` group (the positive/dup-cluster id — whatever upstream
    * grouping defines "same item": a near-dup component, a semantic
    * class, a source document). The highest-similarity out-of-cluster
    * items are exactly the hardest negatives for contrastive training.
    *
    * Scale shape: anchors broadcast (the anchor set is a sample, never
    * the corpus), corpus scored scan-side with ZERO shuffle of corpus
    * rows; extraction is the bounded [[graft.functions.TopKAgg]] heap
    * (map-side combine — the |corpus|×|anchors| score volume is never
    * sorted; same ppm lift as [[IvfIndex.knnGraph]], bit-equal to the
    * 6-dp window form). Rows with a NULL label on either side are
    * excluded (an unknown cluster can't be proven negative) — matching
    * SQL `<>` semantics.
    */
  def hardNegatives(
      corpus: DataFrame, anchors: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int,
      queryIdCol: String = "query_id"): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    require(Seq(org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.ShortType)
      .contains(corpus.schema(idCol).dataType),
      s"hardNegatives needs an integral id for the heap encoding; " +
        s"'$idCol' is ${corpus.schema(idCol).dataType}")
    val q = broadcast(anchors.select(
      col(idCol).as(queryIdCol), col(vecCol).as("__qvec"),
      col(labelCol).as("__qlabel"), norm(col(vecCol)).as("__qnorm")))
    val c = corpus.select(col(idCol), col(vecCol), col(labelCol),
      norm(col(vecCol)).as("__cnorm"))
    val scored = c.join(q, col("__qlabel") =!= col(labelCol))
      .withColumn("similarity",
        round6(dot(col("__qvec"), col(vecCol)) / (col("__qnorm") * col("__cnorm"))))
      .select(col(queryIdCol), col(idCol).as("neighbor_id"), col("similarity"))
    val ppm = when(col("similarity").isNull, lit(Long.MinValue))
      .otherwise(floor(col("similarity") * 1e6 + 0.5).cast("long"))
    scored.withColumn("__ppm", ppm)
      .groupBy(col(queryIdCol))
      .agg(graft.functions.TopKAgg.topK(
        col("neighbor_id").cast("long"), col("__ppm"), k).as("__tk"))
      .select(col(queryIdCol), posexplode(col("__tk")))
      .select(col(queryIdCol),
        col("col._2").cast(corpus.schema(idCol).dataType).as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"),
        when(col("col._1") === Long.MinValue, lit(null))
          .otherwise(col("col._1") / 1e6).as("similarity"))
  }

  /** IVF-style partitioned top-k: corpus pre-assigned to coarse clusters
    * (`clusterCol` — from k-means, LSH, or an upstream partitioner);
    * each query probes only its own cluster. Trades recall for a
    * 1/n_clusters scan fraction; nprobe>1 = union over nearest clusters.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, clusterCol: String, k: Int,
      queryIdCol: String = "query_id"): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val q = broadcast(queries.select(
      col(idCol).as(queryIdCol), col(vecCol).as("__qvec"),
      col(clusterCol).as("__qcluster"),
      norm(col(vecCol)).as("__qnorm")))
    val c = corpus.select(col(idCol), col(vecCol), col(clusterCol),
      norm(col(vecCol)).as("__cnorm"))
    val scored = c
      .join(q, col("__qcluster") === col(clusterCol) && col(queryIdCol) =!= col(idCol))
      .withColumn("similarity",
        round6(dot(col("__qvec"), col(vecCol)) / (col("__qnorm") * col("__cnorm"))))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("similarity").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"),
        col("rank"), col("similarity"))
  }

  /** Deterministic cluster representatives: the member with the
    * smallest id (medoid-by-id). Float-mean centroids are partition-
    * order-dependent in their low bits; a medoid is reproducible on any
    * engine, which keeps multi-probe routing oracle-checkable. */
  def clusterMedoids(
      corpus: DataFrame, idCol: String, vecCol: String,
      clusterCol: String): DataFrame = {
    val minIds = corpus.groupBy(col(clusterCol))
      .agg(min(col(idCol)).as("__medoid_id"))
      .withColumnRenamed(clusterCol, "__mcluster")
    corpus.join(minIds,
        col(idCol) === col("__medoid_id") &&
          col(clusterCol) === col("__mcluster"))
      .select(col("__mcluster").as(clusterCol), col(vecCol).as("__medoid_vec"))
  }

  /** IVF top-k with multi-probe: each query routes to its `nprobe`
    * nearest clusters (by cosine to the cluster medoid), then scores
    * only those clusters' members. nprobe=#clusters degenerates to
    * brute force; recall rises with nprobe at linear extra scan cost. */
  def ivfTopKProbed(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, clusterCol: String,
      k: Int, nprobe: Int,
      queryIdCol: String = "query_id"): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val medoids = broadcast(clusterMedoids(corpus, idCol, vecCol, clusterCol)
      .select(col(clusterCol).as("__mc"), col("__medoid_vec"),
        norm(col("__medoid_vec")).as("__mnorm")))
    val q = queries.select(col(idCol).as(queryIdCol),
      col(vecCol).as("__qvec"), norm(col(vecCol)).as("__qnorm"))
    val routeW = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__route_sim").desc, col("__mc"))
    val probed = q.join(medoids)
      .withColumn("__route_sim",
        round6(dot(col("__qvec"), col("__medoid_vec")) /
          (col("__qnorm") * col("__mnorm"))))
      .withColumn("__r", row_number().over(routeW))
      .filter(col("__r") <= nprobe)
      .select(col(queryIdCol), col("__qvec"), col("__qnorm"), col("__mc"))
    val c = corpus.select(col(idCol), col(vecCol), col(clusterCol),
      norm(col(vecCol)).as("__cnorm"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("similarity").desc, col(idCol))
    c.join(broadcast(probed),
        col("__mc") === col(clusterCol) && col(queryIdCol) =!= col(idCol))
      .withColumn("similarity",
        round6(dot(col("__qvec"), col(vecCol)) / (col("__qnorm") * col("__cnorm"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"),
        col("rank"), col("similarity"))
  }

  /** The fixed seed-derived hyperplanes used by [[hyperplaneBucket]] —
    * exposed so oracles/tests can replay the exact projection. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 7L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Hyperplane bit-width that keeps the EXPECTED bucket size near
    * `targetBucketSize` as the corpus grows: a fixed bit-width is the
    * classic LSH scale cliff — within-bucket candidate pairs grow
    * quadratically in corpus size once buckets saturate (measured on
    * the fusion pipeline: 10× docs at 8 fixed bits → 104× image
    * candidates → 16× wall). With bits = log2(n / target), buckets
    * scale with n and candidate volume grows ~linearly
    * (n · target / 2). Identical vectors collide at ANY width, so
    * exact-duplicate recall is unaffected; near-miss recall per bit is
    * the standard LSH tradeoff (band more tables if that matters).
    * Clamped to [4, 24] — 2^24 buckets is past any single-job corpus
    * where one table still makes sense. */
  def adaptiveHyperplaneBits(corpusSize: Long, targetBucketSize: Int = 16): Int = {
    val buckets = math.max(1.0, corpusSize.toDouble / math.max(1, targetBucketSize))
    math.min(24, math.max(4, math.ceil(math.log(buckets) / math.log(2.0)).toInt))
  }

  /** Random-hyperplane LSH bucket id: `nBits` sign bits of projections
    * onto fixed seed-derived hyperplanes. Vectors in the same bucket are
    * near-duplicate candidates (cosine-LSH). Deterministic across runs.
    * Each projection is one native vector_dot against a literal plane
    * array (codegen'd; an element_at-per-term expansion re-evaluates
    * the array cast dim× per plane). */
  def hyperplaneBucket(vec: Column, dim: Int, nBits: Int, seed: Long = 7L): Column =
    hyperplanes(dim, nBits, seed).zipWithIndex.map { case (p, i) =>
      val proj = dot(vec, array(p.toSeq.map(lit): _*))
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** Near-dup pairs with cosine ≥ minSim, restricted to pairs sharing a
    * blocking key (pre-assigned cluster, LSH bucket, …): the general
    * sub-quadratic shape — exact verification within blocks, recall
    * governed by the blocking function. */
  def blockedNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      bucket: Column, minSim: Double): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val b = corpus.select(col(idCol), col(vecCol), bucket.as("bucket"),
      norm(col(vecCol)).as("__norm"))
    b.alias("x").join(b.alias("y"),
        col("x.bucket") === col("y.bucket") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .withColumn("similarity",
        round6(dot(col(s"x.$vecCol"), col(s"y.$vecCol")) /
          (col("x.__norm") * col("y.__norm"))))
      .filter(col("similarity") >= minSim)
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        col("similarity"))
  }

  /** k-NN graph: EVERY row → its k most similar other rows (not just a
    * query set) — the all-pairs shape behind diversity sampling and
    * graph-based dedup. Unblocked this is O(n²); restricting candidates
    * to a blocking key (LSH bucket, IVF cluster) makes it quadratic
    * only within blocks, recall governed by the blocking function —
    * identical cost shape to [[blockedNearDupPairs]] plus a per-node
    * top-k window that partial-sorts within the node's partition. */
  def knnGraphBlocked(
      corpus: DataFrame, idCol: String, vecCol: String,
      bucket: Column, k: Int): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val b = corpus.select(col(idCol), col(vecCol), bucket.as("bucket"),
      norm(col(vecCol)).as("__norm"))
    val w = Window.partitionBy(col(s"x.$idCol"))
      .orderBy(col("similarity").desc, col(s"y.$idCol"))
    b.alias("x").join(b.alias("y"),
        col("x.bucket") === col("y.bucket") &&
          col(s"x.$idCol") =!= col(s"y.$idCol"))
      .withColumn("similarity",
        round6(dot(col(s"x.$vecCol"), col(s"y.$vecCol")) /
          (col("x.__norm") * col("y.__norm"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(s"x.$idCol").as("id"), col(s"y.$idCol").as("neighbor_id"),
        col("rank"), col("similarity"))
  }

  /** Embedding near-dup pairs within random-hyperplane LSH buckets — the
    * scale path for embedding-level dedup (sub-quadratic; exact
    * within-bucket verification, LSH-probability recall across buckets).
    */
  def embeddingNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, minSim: Double, nBits: Int = 8): DataFrame =
    blockedNearDupPairs(corpus, idCol, vecCol,
      hyperplaneBucket(col(vecCol), dim, nBits), minSim)

  /** Int8 scalar quantization: per-vector symmetric scale
    * s = max(|v|)/127, elements rounded to integers in [-127, 127].
    * At 100 TB this is the standard ANN scan-cost lever — a quantized
    * corpus is 4× fewer bytes than float32 (and 8× vs the double math),
    * so a brute-force or IVF scan reads a quarter of the data for a
    * recall loss bounded by the quantization step. Every step is
    * integer- or IEEE-exact (max, float→double widening, one double
    * divide, half-away-from-zero round), so the quantized vectors —
    * and any integer dot over them — replay bit-for-bit in DuckDB.
    * The scale column rides along for de-quantization:
    * dot(a,b) ≈ qdot(a,b) · s_a · s_b. Zero vectors quantize to the
    * zero vector with scale 0 (no division-by-zero path).
    *
    * Output: idCol, `__qvec: array<bigint>`, `__qscale: double`.
    * (bigint, not tinyint: the integer DOT's accumulator needs 64-bit
    * anyway, and array<long> avoids a per-element widening cast in the
    * scoring loop.) */
  def scalarQuantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // scale materialized in its own projection first: referencing it
    // inside the transform lambda would re-evaluate the array_max fold
    // once per element (the q54 lesson)
    df.select(col(idCol), col(vecCol),
        (array_max(transform(col(vecCol), x => abs(x))).cast("double") / 127.0)
          .as("__qscale"))
      .select(col(idCol),
        when(col("__qscale") === 0.0,
          transform(col(vecCol), _ => lit(0L)))
        .otherwise(transform(col(vecCol),
          x => round(x.cast("double") / col("__qscale")).cast("long")))
        .as("__qvec"),
        col("__qscale"))
  }

  /** Integer dot over two quantized vectors — exact 64-bit arithmetic,
    * no FP noise, so cross-engine rank ties cannot exist below the
    * integer resolution. Runs through the codegen'd
    * [[graft.functions.VectorDotLong]] (caller registers; operators
    * here do it themselves). */
  def quantizedDot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotLong(a, b)

  /** Builtin-HOF twin of [[quantizedDot]] (interpreted) — the
    * zero-registration path and the semantic reference for tests,
    * exactly like [[dotHof]] vs [[dot]]. */
  def quantizedDotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Brute-force top-k over the QUANTIZED corpus: same broadcast
    * query-set / scan-side scoring shape as [[bruteForceTopK]], but the
    * pair score is the exact integer dot de-quantized by the two scale
    * factors — ranking equivalent to approximate cosine by qdot·s_q·s_c
    * (per-query norm is a constant within a ranking). Emits the integer
    * `qdot` (not the double score) so the result hashes exactly. */
  def quantizedTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      queryIdCol: String = "query_id"): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val q = broadcast(scalarQuantize(queries, idCol, vecCol).select(
      col(idCol).as(queryIdCol), col("__qvec").as("__qq"),
      col("__qscale").as("__qs")))
    val c = scalarQuantize(corpus, idCol, vecCol)
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__score").desc, col(idCol))
    c.join(q, col(queryIdCol) =!= col(idCol))
      .withColumn("qdot", quantizedDot(col("__qq"), col("__qvec")))
      .withColumn("__score",
        col("qdot").cast("double") * col("__qs") * col("__qscale"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"),
        col("rank"), col("qdot"))
  }

  /** SemDeDup-style semantic dedup: within each blocking cell (IVF
    * cluster, LSH bucket), a row is DROPPED when any lower-id row in
    * the same cell is cosine-similar above `minSim`; survivors are
    * returned unchanged. The deterministic keep-lowest-id rule makes
    * the survivor set a pure function of the corpus (no iteration, no
    * clustering pass): b survives iff ∄ a<b in b's cell with
    * cos(a,b) ≥ minSim — directly SQL-replayable as NOT EXISTS.
    *
    * The drop test is against ANY earlier row, surviving or not: in a
    * chain a~b~c (ids ascending, cos(a,c) < minSim), b drops via a and
    * c drops via b even though b itself was dropped — one representative
    * per transitive chain, the same outcome as components-based dedup
    * ([[graft.operators.Components]]) on chains, without the iterative
    * propagation pass. The two differ only on sparser shapes (e.g. c
    * similar to nothing below it but to a dropped higher-id row —
    * impossible, the pair is oriented) — in fact every drop is
    * witnessed by its smallest similar predecessor, so the rule is a
    * single-pass, embarrassingly-parallel approximation of components
    * that can only keep MORE rows than components, never fewer.
    *
    * Cost shape: one blocked pair join (never all-pairs — quadratic
    * only within cells, same shape as [[blockedNearDupPairs]]) + one
    * anti-join of the corpus against the dropped-id set. At 100 TB the
    * pair join is the IVF-cluster-scoped scan and the anti-join is
    * broadcast when the drop set is small (the common case at high
    * `minSim`).
    */
  def semanticDedup(
      corpus: DataFrame, idCol: String, vecCol: String,
      block: Column, minSim: Double): DataFrame = {
    val dropped = blockedNearDupPairs(corpus, idCol, vecCol, block, minSim)
      .select(col("id_b").as(idCol)).distinct()
    corpus.join(dropped, Seq(idCol), "left_anti")
  }

  /** Assign every vector to its nearest LITERAL centroid — the same
    * ‖c‖²−2⟨v,c⟩ first-minimum argmin as [[kmeansAssign]]/[[IvfPq]]
    * assignment, for callers that already hold the trained centroids
    * (a shared coarse model across several indexes). Adds `cluster`. */
  def assignToCentroids(corpus: DataFrame, vecCol: String,
      centroids: Seq[Array[Double]]): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    corpus.withColumn("cluster", ProductQuant.nearestCode(
      col(vecCol).cast("array<double>"), centroids))
  }

  /** Unsupervised coarse quantization: assign every vector to one of k
    * Lloyd-trained centroids — the missing front half of the IVF
    * lifecycle when no label column exists. Training is
    * [[ProductQuant.trainCodebooksLloyd]] with a SINGLE full-dimension
    * subspace (m = 1), so it inherits the fixed-point determinism
    * (partition-order-free integer sums, engine-replayable centroids)
    * and the encode step's first-minimum tie-break. The assignment is
    * a pure scan-side projection against k literal centroids — zero
    * shuffles on the corpus. Output: corpus columns + `cluster`. */
  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val books = ProductQuant.trainCodebooksLloyd(
      corpus, idCol, vecCol, m = 1, k = k, iters = iters)
    corpus
      .withColumn("cluster", ProductQuant.nearestCode(
        col(vecCol).cast("array<double>"), books.head))
  }

  // --- Binary (1-bit) quantization: the 32x scan-bytes ANN lever ---

  /** Pack the sign bits (x > 0) of a fixed-`dim` float vector into
    * ⌈dim/64⌉ longs — 1 bit/dimension, a 32× compression over float32.
    * Bit i of word w is dimension 64·w + i, so a 64-dim embedding is
    * ONE long and Hamming distance is one `bit_count(a XOR b)` — three
    * codegen'd integer instructions per pair vs 64 FMAs for the float
    * dot. The sign transform preserves angular structure (it is
    * hyperplane LSH with the coordinate axes as hyperplanes), so
    * Hamming distance is a monotone estimator of angle — good enough
    * to SHORTLIST, not to rank, hence [[hammingTopK]] reranks exact. */
  def signBits(vec: Column, dim: Int): Column = {
    require(dim > 0, s"signBits needs a positive dim, got $dim")
    val words = (0 until dim by 64).map { w0 =>
      (w0 until math.min(w0 + 64, dim)).map { i =>
        when(element_at(vec, i + 1) > 0f, shiftleft(lit(1L), i - w0))
          .otherwise(lit(0L))
      }.reduce[Column](_.bitwiseOR(_))
    }
    array(words: _*)
  }

  /** Hamming distance between two packed sign-bit codes: a STATIC
    * xor/popcount chain over the fixed word count — stays inside
    * whole-stage codegen (the zip_with/aggregate HOF form runs
    * interpreted and measured 7× slower than the float brute force it
    * is supposed to beat; hamscale). */
  def hammingDist(a: Column, b: Column, words: Int): Column = {
    require(words >= 1, s"words $words")
    (0 until words).map(w =>
      bit_count(element_at(a, w + 1).bitwiseXOR(element_at(b, w + 1)))
        .cast("long"))
      .reduce[Column](_ + _)
  }

  /** Builtin-HOF twin of [[hammingDist]] (interpreted — the semantic
    * reference for tests, same contract as [[dotHof]]). */
  def hammingDistHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Per-query SMALLEST-hamming shortlist of `scored` rows
    * (queryIdCol, idCol, "hamming") — the bounded [[graft.functions
    * .TopKAgg]] heap for integral ids (value = −hamming, so the heap's
    * value-DESC/id-ASC contract IS hamming ASC/id ASC; null hamming →
    * Long.MinValue = the window's NULLS LAST), the `row_number` window
    * otherwise. The heap form is the q84 medicine: the candidate
    * volume is map-side-combined per query and NEVER globally sorted —
    * the |corpus|×|queries| sort feeding WindowGroupLimit is the first
    * thing to die at a 100× corpus with many queries. */
  private[operators] def hammingShortlist(scored: DataFrame,
      queryIdCol: String, idCol: String, shortlist: Int): DataFrame = {
    val integralId = scored.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => true
      case _ => false
    }
    if (integralId) {
      val negH = when(col("hamming").isNull, lit(Long.MinValue))
        .otherwise(-col("hamming"))
      scored.withColumn("__negh", negH)
        .groupBy(col(queryIdCol))
        .agg(graft.functions.TopKAgg.topK(
          col(idCol).cast("long"), col("__negh"), shortlist).as("__tk"))
        .select(col(queryIdCol), explode(col("__tk")).as("__e"))
        .select(col(queryIdCol),
          col("__e._2").cast(scored.schema(idCol).dataType).as(idCol),
          when(col("__e._1") === Long.MinValue, lit(null))
            .otherwise(-col("__e._1")).as("hamming"))
    } else {
      // nulls LAST to match the heap encoding (unreachable with
      // signBits codes — a null vector packs to code 0 — but the two
      // branches must agree on the full domain)
      val wH = Window.partitionBy(col(queryIdCol))
        .orderBy(col("hamming").asc_nulls_last, col(idCol))
      scored.withColumn("__hrank", row_number().over(wH))
        .filter(col("__hrank") <= shortlist)
        .select(col(queryIdCol), col(idCol), col("hamming"))
    }
  }

  /** Pass 2 of every Hamming-shortlist serving path: exact cosine
    * rerank of the (queryIdCol, idCol, hamming) candidates against the
    * raw corpus — one candidate-pruned scan (broadcast semi-join on
    * id) fetching float vectors for |queries|·shortlist rows only. */
  private[operators] def hammingRerank(corpus: DataFrame,
      queries: DataFrame, cand: DataFrame, idCol: String, vecCol: String,
      k: Int, queryIdCol: String): DataFrame = {
    val qVecs = broadcast(queries.select(
      col(idCol).as("__qid"), col(vecCol).as("__qvec"),
      norm(col(vecCol)).as("__qnorm")))
    val wS = Window.partitionBy(col(queryIdCol))
      .orderBy(col("similarity").desc, col(idCol))
    corpus.select(col(idCol), col(vecCol), norm(col(vecCol)).as("__cnorm"))
      .join(broadcast(cand), Seq(idCol))
      .join(qVecs, col(queryIdCol) === col("__qid"))
      .withColumn("similarity",
        round6(dot(col("__qvec"), col(vecCol)) / (col("__qnorm") * col("__cnorm"))))
      .withColumn("rank", row_number().over(wS))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"),
        col("rank"), col("hamming"), col("similarity"))
  }

  /** Deterministic block expansion of a `dim`-dim vector to
    * `blocks`·dim dims via per-block ±1 sign patterns — the multi-word
    * binary-code path when the base embedding is narrow (testdata is
    * 64-dim, one code word): block j's element p is v[p]·m(j,p) with
    * [[expandSign]] m, block 0 the identity. Each expanded sign bit is
    * one more axis-aligned-after-flip hyperplane test, so Hamming over
    * the expanded code is a finer angular estimator whose word 0
    * equals the base [[signBits]] code. Engine-replayable: the
    * pattern is a closed form, no RNG. */
  def expandSignBlocks(vec: Column, dim: Int, blocks: Int): Column = {
    require(dim >= 1 && blocks >= 1, s"dim $dim blocks $blocks")
    array((0 until blocks * dim).map { i =>
      element_at(vec, i % dim + 1).cast("double") *
        lit(expandSign(i / dim, i % dim))
    }: _*)
  }

  /** The ±1 pattern of [[expandSignBlocks]]: +1 iff (j·(p+1)) mod 4 < 2
    * — block 0 all +1, blocks 1..3 three distinct flip patterns.
    * Exposed so oracles/specs replay the exact expansion. */
  def expandSign(j: Int, p: Int): Double =
    if ((j * (p + 1)) % 4 < 2) 1.0 else -1.0

  /** Binary-shortlist top-k with exact rerank: Hamming distance on the
    * packed codes picks `shortlist` candidates per query (the cheap
    * pass — this scan touches 1/32 of the corpus vector bytes and the
    * candidate window moves only (query_id, id, hamming) triples, never
    * a float vector), then exact cosine reranks ONLY the shortlist via
    * a broadcast candidate-pruned second scan — the IVFADC+R refine
    * shape ([[IvfPq.topKRefined]]). Emits both the hamming distance and
    * the exact similarity so the recall/precision trade is auditable
    * downstream. Both passes keep the corpus shuffle-free: queries are
    * broadcast, and the shortlist (|queries|·shortlist rows) is
    * broadcast back into the rerank scan. */
  def hammingTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int, shortlist: Int,
      queryIdCol: String = "query_id"): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) or the rerank starves")
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    // Pass 1 — codes only. The join output is narrow integers; the
    // per-query shortlist window never sees a vector. The code table is
    // MATERIALIZED (scratch parquet, zero pinned storage): under the
    // broadcast nested-loop join, whole-stage codegen re-evaluates the
    // streamed side's projection PER EMITTED PAIR, so an unmaterialized
    // 64-term signBits chain costs |queries|× the scan it should
    // (measured 31.6s vs 0.86s on 1M×20 — hamscale). At 100 TB the
    // codes are a stored index anyway; this is the 1/32-size artifact
    // the scan reads.
    val qCodes = broadcast(queries.select(
      col(idCol).as(queryIdCol), signBits(col(vecCol), dim).as("__qcode")))
    val cCodes = Lifecycle.materializeToScratch(
      corpus.select(col(idCol), signBits(col(vecCol), dim).as("__ccode")))
    val words = (dim + 63) / 64
    val cand = hammingShortlist(
      cCodes.join(qCodes, col(queryIdCol) =!= col(idCol))
        .withColumn("hamming",
          hammingDist(col("__qcode"), col("__ccode"), words))
        .select(col(queryIdCol), col(idCol), col("hamming")),
      queryIdCol, idCol, shortlist)
    // Pass 2 — exact rerank of the tiny shortlist: one candidate-pruned
    // corpus scan (broadcast semi-join on id) fetches the float vectors
    // for |queries|·shortlist rows only.
    hammingRerank(corpus, queries, cand, idCol, vecCol, k, queryIdCol)
  }
}
