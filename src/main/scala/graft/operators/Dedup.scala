package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (hash group-by), n-gram Jaccard (exact set overlap),
  * MinHash+LSH (sub-quadratic candidate generation), SimHash (Hamming
  * near-dup). All set-oriented — no driver-side loops, no UDFs in the
  * hot path.
  *
  * Two hash modes: the default (`portable = false`) uses xxhash64 —
  * one codegen'd 64-bit hash per value, the 100 TB path. `portable =
  * true` derives 60 bits from md5 hex, which every ANSI engine can
  * reproduce (`conv(substr(md5(x),1,15),16,10)`), so the whole
  * MinHash/SimHash pipeline is oracle-checkable in DuckDB bit-for-bit.
  * Same dataflow, same shuffles — only the leaf hash differs.
  *
  * Scale notes: exact dedup is one shuffle on the fingerprint. The LSH
  * path shuffles (doc, shingle) once to build signatures, then
  * (band, bucket) once to find candidates — both keyed shuffles that
  * partition evenly because bucket keys are hashes. The final verify
  * join touches only candidate pairs (linear-ish in near-dup count),
  * never the quadratic pair space.
  */
object Dedup {

  /** Exact dedup on arbitrary key expression: keeps min(id) per group. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[Column]): DataFrame =
    df.groupBy(keyCols: _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Anti-join of `batch` against `index` on `keyCol` (exact "which
    * batch rows are NOT already in the corpus" membership dedup), with
    * a bloom-filter prune of the INDEX side: the index — the 100 TB
    * side in an incremental-ingest pipeline — is filtered to rows whose
    * key *might* be in the batch before any shuffle happens, so the
    * join moves ~|batch| + fpp·|index| rows instead of the whole
    * corpus. Exact by construction: blooms have no false negatives, so
    * no index row that actually matches a batch key is pruned, and the
    * anti-join itself discharges the false positives. This is Spark's
    * own runtime-filter pattern (InjectRuntimeFilter) made explicit —
    * available regardless of join strategy, sized by the caller, and
    * reusable across batches.
    *
    * Sizing: the bloom is built over the BATCH keys (the small side;
    * driver tree-aggregate). 1e8 keys at 1% fpp ≈ 120 MB — beyond
    * that, raise fpp (costs only extra verify rows, never correctness)
    * or shard the batch. */
  def bloomPrunedAntiJoin(
      batch: DataFrame, index: DataFrame, keyCol: String,
      fpp: Double = 0.01,
      expectedBatchKeys: Option[Long] = None): DataFrame = {
    import graft.functions.BloomFunctions
    BloomFunctions.register(batch.sparkSession)
    val nKeys = expectedBatchKeys.getOrElse(batch.count())
    val bloomBytes = BloomFunctions.buildHashedBloom(batch, keyCol, nKeys, fpp)
    val prunedIndex = index
      .filter(BloomFunctions.mightContainHashed(bloomBytes, col(keyCol)))
      .select(col(keyCol))
    batch.join(prunedIndex, Seq(keyCol), "left_anti")
  }

  /** Distinct word n-gram shingles, one row per (id, shingle). Texts
    * shorter than n tokens yield one whole-text shingle.
    *
    * The token array is materialized in its own projection BEFORE the
    * higher-order transform: an expression referenced inside a lambda
    * is re-evaluated per element, so inlining the regex split would
    * re-split the text 3× per shingle (measured 6× slower at sf0.1). */
  /** CPU-heavy scan-side stages over a small single-file corpus arrive
    * as one input split and run on one core. Widen only when the source
    * is narrower than the session's shuffle parallelism (a real 100 TB
    * scan has thousands of splits, so this never adds a shuffle at
    * scale). */
  private[graft] def widen(df: DataFrame, idCol: String): DataFrame =
    widen(df, col(idCol))

  /** Key-expression overload for sources without a natural id column
    * (e.g. a bare text corpus): any deterministic expression with
    * enough distinct values spreads the rows (guide §2.5 — derive
    * synthetic partitioning keys deterministically, never rand()). */
  private[graft] def widen(df: DataFrame, key: Column): DataFrame = {
    if (df.isStreaming) return df // micro-batch sizing governs parallelism
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // toRdd, not df.rdd: same physical partition count without building
    // the extra Row-deserializer RDD on the driver per call. (NOT
    // executedPlan.outputPartitioning — file scans report
    // UnknownPartitioning(0), which would read as "always narrower".)
    if (df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target, key)
    else df
  }

  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val src = widen(df, idCol)
    val withToks = src.select(col(idCol),
      TextAnalysis.whitespaceTokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    val sh = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    ).otherwise(array(when(toks.isNull, lit(null).cast("string"))
      .otherwise(concat_ws(" ", toks))))
    // null-text docs carry a NULL shingle: they survive per-doc counts
    // but can never equi-join, so they participate in no near-dup
    // relation — matching the SQL-oracle semantics where NULL never
    // matches NULL (concat_ws alone would silently turn them into ""
    // and pair them with genuinely-empty docs). Pinned by NullTextSpec.
    withToks.select(col(idCol), explode(sh).as("shingle")).distinct()
  }

  val MersennePrime31 = 2147483647L // 2^31 - 1

  /** 60-bit hash of a string column. Portable mode = first 15 hex chars
    * of md5 as an integer — reproducible in any engine with md5();
    * fast mode = xxhash64 (codegen'd, no string intermediate). */
  def stringHash(c: Column, portable: Boolean): Column =
    if (portable) conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    else xxhash64(c)

  /** Fixed, seed-derived universal-hash parameters (deterministic across
    * runs/engines — required for resumable pipelines and oracle checks). */
  def hashParams(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Exact pairwise n-gram Jaccard ≥ minJaccard via a shingle equi-join:
    * candidate pairs are only those sharing ≥1 shingle. Correct and
    * fully SQL-expressible; quadratic only within shingle buckets, so at
    * very large scale prefer [[minHashPairs]] (same output minus LSH
    * false negatives) or cap bucket width by dropping too-frequent
    * shingles (stopword-shingle suppression). */
  /** @param maxDocFreq stop-shingle cap: shingles occurring in more
    *        than this many docs are excluded from CANDIDATE GENERATION
    *        (verification still uses full shingle sets, so surviving
    *        pairs carry exact Jaccard). Bounds the worst shingle-bucket
    *        width — the quadratic term — at the cost of missing pairs
    *        that share only ultra-common shingles. None = exact. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double,
      maxDocFreq: Option[Int] = None): DataFrame = {
    // EAGER: runs the pair job now, then frees the pinned shingle /
    // candidate frames (see [[Lifecycle]] — the lazy-return-plus-
    // internal-persist combination leaks pinned corpus-sized frames
    // in long-lived sessions). The returned pairs are materialized,
    // lineage-free, GC-bounded.
    val (out, pinned) =
      ngramJaccardPairsLazy(df, idCol, textCol, n, minJaccard, maxDocFreq)
    Lifecycle.materializeThenRelease(out, pinned: _*)
  }

  /** The un-materialized plan + the frames it pins (plan-shape tests
    * inspect this; production callers use [[ngramJaccardPairs]]). */
  private[graft] def ngramJaccardPairsLazy(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double,
      maxDocFreq: Option[Int]): (DataFrame, Seq[DataFrame]) = {
    // the shingle relation feeds both join sides and the size counts;
    // column-pruned variants don't canonicalize to one exchange, so
    // without persist() Spark scans+reshingles the corpus 3x
    val sh = shingles(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    maxDocFreq match {
      case None =>
        // exact path: count co-occurrences directly in the self-join
        val common = sh.alias("a").join(sh.alias("b"),
            col("a.shingle") === col("b.shingle") &&
              col(s"a.$idCol") < col(s"b.$idCol"))
          .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
          .agg(count(lit(1)).as("common"))
        (jaccardOverPairs(sh, idCol, common, minJaccard), Seq(sh))
      case Some(maxDf) =>
        // Capped path. Candidates = pairs sharing >=1 rare shingle;
        // their common count over the FULL sets splits into
        // common_rare + common_freq. common_rare falls out of the
        // candidate self-join's OWN aggregation (no distinct-then-
        // re-expand: joining candidates back against full shingle sets
        // is |pairs| x |set| rows — the measured 59M-row hot spot).
        // Jaccard is monotone in common, and common_freq <= min(f_a,
        // f_b), so an upper-bound prune kills almost every candidate
        // before the (small) frequent-shingle join runs.
        val freq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
        val shDf = sh.join(freq, "shingle")
        val rareSh = shDf.filter(col("__df") <= maxDf)
          .select(col(idCol), col("shingle"))
        val freqSh = shDf.filter(col("__df") > maxDf)
          .select(col(idCol), col("shingle"))
        val commonRare = rareSh.alias("a").join(rareSh.alias("b"),
            col("a.shingle") === col("b.shingle") &&
              col(s"a.$idCol") < col(s"b.$idCol"))
          .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
          .agg(count(lit(1)).as("common_rare"))
        val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
        val freqCounts = freqSh.groupBy(col(idCol)).agg(count(lit(1)).as("n_freq"))
        val prelim = commonRare
          .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), "id_a")
          .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), "id_b")
          .join(freqCounts.select(col(idCol).as("id_a"), col("n_freq").as("f_a")),
            Seq("id_a"), "left")
          .join(freqCounts.select(col(idCol).as("id_b"), col("n_freq").as("f_b")),
            Seq("id_b"), "left")
          .withColumn("__max_common", col("common_rare") +
            least(coalesce(col("f_a"), lit(0L)), coalesce(col("f_b"), lit(0L))))
          .filter(col("__max_common").cast("double") /
            (col("n_a") + col("n_b") - col("__max_common")) >= minJaccard)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val commonFreq = prelim.select(col("id_a"), col("id_b"))
          .join(freqSh.select(col(idCol).as("id_a"), col("shingle")), "id_a")
          .join(freqSh.select(col(idCol).as("id_b"), col("shingle")),
            Seq("id_b", "shingle"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("common_freq"))
        val out = prelim.join(commonFreq, Seq("id_a", "id_b"), "left")
          .withColumn("common",
            col("common_rare") + coalesce(col("common_freq"), lit(0L)))
          .withColumn("jaccard", col("common").cast("double") /
            (col("n_a") + col("n_b") - col("common")))
          .filter(col("jaccard") >= minJaccard)
          .select(col("id_a"), col("id_b"), col("jaccard"))
        (out, Seq(sh, prelim))
    }
  }

  /** (id_a, id_b, common) + per-id shingle counts → jaccard filter. */
  private def jaccardOverPairs(
      sh: DataFrame, idCol: String, common: DataFrame,
      minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signatures: k permutations h_i(x) = (a_i·x + b_i) mod p over
    * a 60-bit shingle hash reduced mod p; one aggregation computes all k
    * mins map-side (partial agg), so the shuffle carries only k longs
    * per doc. Returns (id, mh_0 … mh_{k-1}). */
  def minHashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, seed: Long = 42L,
      portable: Boolean = false): DataFrame =
    minHashSignaturesFromShingles(shingles(df, idCol, textCol, shingleN),
      idCol, numHashes, seed, portable)

  private def minHashSignaturesFromShingles(
      sh: DataFrame, idCol: String, numHashes: Int, seed: Long,
      portable: Boolean): DataFrame = {
    val hashed = sh.withColumn("h",
      pmod(stringHash(col("shingle"), portable), lit(MersennePrime31)))
    val mins = hashParams(numHashes, seed).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * a + b, lit(MersennePrime31))).as(s"mh_$i")
    }
    hashed.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** Scan-side MinHash signatures: the same (id, mh_0 … mh_{k-1}) output
    * as [[minHashSignatures]], computed per-row with array
    * higher-order functions (shingle array → distinct → per-permutation
    * array_min) instead of explode + groupBy. No shuffle and no
    * aggregation state — so it runs UNCHANGED on a streaming DataFrame
    * (the aggregation form can't: `distinct()` over exploded shingles is
    * a stateful streaming agg). Prefer the aggregation form for batch
    * when the corpus is huge and per-row shingle arrays would be wide;
    * this form for streams and signature-enrichment pipelines. Each
    * array is materialized in its own projection before a lambda
    * references it (lambda-inlined expressions re-evaluate per element). */
  def withMinHashSignature(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    val n = shingleN
    val withToks = widen(df, idCol).withColumn("__toks",
      TextAnalysis.whitespaceTokens(col(textCol)))
    val toks = col("__toks")
    val sh0 = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    ).otherwise(array(concat_ws(" ", toks)))
    val withH = withToks
      // null-text docs have no shingles, hence no signature and no LSH
      // blocks — they can never near-dup-match anything (NullTextSpec;
      // mirrors [[shingles]]' NULL-shingle rule)
      .filter(col("__toks").isNotNull)
      .withColumn("__sh", array_distinct(sh0))
      .withColumn("__h", transform(col("__sh"),
        s => pmod(stringHash(s, portable), lit(MersennePrime31))))
    val sigCols = hashParams(numHashes, seed).zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("__h"),
        h => pmod(h * a + b, lit(MersennePrime31)))).as(s"mh_$i")
    }
    withH.select(col(idCol) +: sigCols: _*)
  }

  /** (id, band_idx, band_hash) banding rows over (id, mh_*) signatures —
    * shared by the batch self-join candidate generator and the streaming
    * stateful bucket matcher. Band key = hash of the comma-joined
    * component string (portable: md5 hex — identical in any engine). */
  def bandedSignatures(
      signatures: DataFrame, idCol: String,
      bands: Int, rows: Int, portable: Boolean = false): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val joined = concat_ws(",",
        (0 until rows).map(r => col(s"mh_${b * rows + r}").cast("string")): _*)
      if (portable) md5(joined).as(s"bh_$b") else xxhash64(joined).cast("string").as(s"bh_$b")
    }
    signatures
      .select(col(idCol) +: bandCols: _*)
      .select(col(idCol), posexplode(array((0 until bands).map(b => col(s"bh_$b")): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
  }

  /** Corpus-sized MinHash band shape: (numHashes, bands, rows). The
    * counterpart of [[Similarity.adaptiveHyperplaneBits]] for the TEXT
    * side — a FIXED band shape is the text pipeline's super-linear
    * cliff: per-band random-collision probability for background
    * similarity s is s^rows, so at fixed rows the expected noise
    * candidates grow ~n², and the measured sf0.1→sf1.0 fusion ratio hit
    * 15.3× at 10× data. Growing `rows` with log(n) shrinks s^rows as
    * the corpus grows; `bands = 2^(rows/2)` holds the LSH threshold
    * (1/bands)^(1/rows) = 2^(-1/2) ≈ 0.707 constant, so recall at the
    * operating point is preserved (the S-curve only gets SHARPER —
    * fewer low-similarity false candidates, slightly better recall
    * above threshold). Hash compute is numHashes = rows·bands per
    * shingle — grows with log(n), paid scan-side, linear in corpus.
    * rows clamped to [4, 12] (4096 bands is past any single-table
    * regime). */
  def adaptiveBandShape(corpusSize: Long): (Int, Int, Int) = {
    val log2n = math.log(math.max(corpusSize, 2).toDouble) / math.log(2.0)
    val rows = math.min(12, math.max(4, 2 * math.ceil(log2n / 7.0).toInt))
    val bands = 1 << (rows / 2)
    (rows * bands, bands, rows)
  }

  /** Within-bucket candidate pairs with a per-bucket cap: in each
    * (band_idx, band_hash) bucket, only the `maxBucket` smallest-id
    * members ("anchors") pair with the rest — per-bucket pairs drop
    * from C(m,2) to C(a,2) + a·(m−a) (linear in m), and every member
    * still links to the bucket's minimum-id anchor, so CONNECTIVITY
    * (the thing downstream dedup clustering consumes) is preserved;
    * only non-anchor–non-anchor pairs are dropped — exactly
    * C(m−a, 2) per bucket, which the caller should surface via
    * [[cappedBandDropped]] (never silently). The rank is a keyed
    * window (partitioned per bucket — no single-task global sort). */
  def cappedBandPairs(banded: DataFrame, idCol: String,
      maxBucket: Int): DataFrame = {
    require(maxBucket >= 1, s"maxBucket $maxBucket")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band_idx"), col("band_hash")).orderBy(col(idCol))
    val ranked = banded.withColumn("__rk", row_number().over(w))
    val anchors = ranked.filter(col("__rk") <= maxBucket)
      .select(col("band_idx"), col("band_hash"), col(idCol).as("id_a"))
    anchors.join(
        ranked.select(col("band_idx"), col("band_hash"),
          col(idCol).as("id_b")),
        Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
  }

  /** Exact count of candidate pairs [[cappedBandPairs]] drops at this
    * cap: Σ_buckets C(max(0, m − maxBucket), 2). One keyed aggregate
    * over the banding rows — cheap, and the price of never capping
    * silently. */
  def cappedBandDropped(banded: DataFrame, maxBucket: Int): Long = {
    val m = col("m")
    banded.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("m"))
      .filter(m > maxBucket)
      .agg(coalesce(
        sum(expr(s"((m - $maxBucket) * (m - $maxBucket - 1)) div 2")),
        lit(0L)).as("dropped"))
      .head().getLong(0)
  }

  /** LSH banding over (id, mh_*) signatures: docs agreeing on all `rows`
    * components of any band are candidates. Collision probability for
    * Jaccard j is 1-(1-j^rows)^bands (≈ step at j ≈ (1/bands)^(1/rows);
    * 16×4 → ~0.5). */
  def lshCandidatePairs(
      signatures: DataFrame, idCol: String,
      bands: Int, rows: Int, portable: Boolean = false): DataFrame = {
    val banded = bandedSignatures(signatures, idCol, bands, rows, portable)
    banded.alias("x").join(banded.alias("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
  }

  /** Full MinHash+LSH near-dup pipeline: candidates from banding, then
    * exact-Jaccard verification restricted to candidates. Output ⊆
    * [[ngramJaccardPairs]] (false negatives only, no false positives). */
  def minHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64,
      bands: Int = 16, minJaccard: Double = 0.5,
      seed: Long = 42L, portable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // one persisted shingle pass feeds signatures, the verify join
    // (both sides), and the size counts — otherwise 5 full re-scans.
    // EAGER (see [[Lifecycle]]): pairs materialize now, the shingle
    // frame unpins before return.
    val sh = shingles(df, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = minHashSignaturesFromShingles(sh, idCol, numHashes, seed, portable)
    val cand = lshCandidatePairs(sigs, idCol, bands, numHashes / bands, portable)
    val common = cand
      .join(sh.select(col(idCol).as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
    Lifecycle.materializeThenRelease(
      jaccardOverPairs(sh, idCol, common, minJaccard), sh)
  }

  /** Incremental near-dup candidates: a NEW batch's banded signatures
    * probed against a persisted banded index of the existing corpus —
    * the build-once / probe-per-batch lifecycle that avoids re-scanning
    * 100 TB for every daily increment. The index side is
    * (id, band_idx, band_hash) rows from [[bandedSignatures]], written
    * out once (partition by band_idx for pruning); each batch costs
    * one keyed join of batch-bands against index-bands plus the
    * verification of colliding pairs. Emits (new_id, indexed_id)
    * candidates; verify with exact Jaccard over the batch's shingles
    * as usual. */
  def lshCandidatesAgainstIndex(
      newBanded: DataFrame, indexBanded: DataFrame,
      idCol: String): DataFrame =
    newBanded.alias("n").join(indexBanded.alias("ix"),
        col("n.band_idx") === col("ix.band_idx") &&
          col("n.band_hash") === col("ix.band_hash"))
      .select(col(s"n.$idCol").as("new_id"),
        col(s"ix.$idCol").as("indexed_id"))
      .distinct()

  /** SimHash signatures over distinct n-gram shingles: per-shingle 60/64
    * bit hash, ±1 votes per bit, sign → bit. One group-by; the per-bit
    * sums partial-aggregate map-side. nBits = 60 portable / 64 fast. */
  def simHashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, portable: Boolean = false): DataFrame = {
    val nBits = if (portable) 60 else 64
    val sh = shingles(df, idCol, textCol, shingleN)
      // null-text docs carry a single NULL shingle: unfiltered, they
      // would all vote to simhash 0 and pair with each other at
      // hamming 0 (NullTextSpec pins that nulls join no near-dup
      // relation; mirrors withMinHashSignature's token filter and the
      // oracle's WHERE shingle IS NOT NULL)
      .filter(col("shingle").isNotNull)
      .withColumn("h", stringHash(col("shingle"), portable))
    val votes = (0 until nBits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v_$i")
    }
    sh.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until nBits).map(i => when(col(s"v_$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, using
    * 4-band blocking (two signatures within Hamming k share ≥1 exact
    * band when k ≤ 3, by pigeonhole at 4 bands). */
  def simHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, maxHamming: Int = 3,
      portable: Boolean = false): DataFrame = {
    val nBits = if (portable) 60 else 64
    val bandBits = nBits / 4
    val mask = (1L << bandBits) - 1
    // EAGER (see [[Lifecycle]]): the signature frame feeds both sides
    // of the banded self-join; pairs materialize now, signatures unpin.
    val sigs = simHashSignatures(df, idCol, textCol, shingleN, portable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    val out = banded.alias("x").join(banded.alias("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    Lifecycle.materializeThenRelease(out, sigs)
  }

  /** Asymmetric shingle containment: C(A→B) = |sh(A)∩sh(B)| / |sh(A)| —
    * the "doc A is quoted/embedded inside doc B" relation that Jaccard
    * misses when the container dwarfs the contained doc (at full
    * containment J ≈ |A|/|B|, arbitrarily small). The standard second
    * axis of corpus dedup: boilerplate pages swallowing articles,
    * aggregator dumps, quote-heavy replies.
    *
    * Candidates = pairs sharing ≥1 RARE shingle (document frequency ≤
    * `maxDocFreq`, the same stop-shingle cap as [[ngramJaccardPairs]] —
    * bounds the quadratic bucket term); verification counts common over
    * the FULL shingle sets via the rare/frequent split, so surviving
    * pairs carry exact containment. Containment is monotone in common
    * and common ≤ common_rare + min(freq_a, freq_b), so the same
    * upper-bound prune kills almost every candidate before the (small)
    * frequent-shingle join runs. Emits one row per DIRECTION clearing
    * `minContainment`: (contained_id, container_id, containment) —
    * a fully-contained pair of near-equal docs yields both rows.
    */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minContainment: Double,
      maxDocFreq: Int): DataFrame = {
    // EAGER (see [[Lifecycle]]): pairs materialize now; the shingle and
    // pruned-candidate frames unpin before return.
    val sh = shingles(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
    val shDf = sh.join(freq, "shingle")
    val rareSh = shDf.filter(col("__df") <= maxDocFreq)
      .select(col(idCol), col("shingle"))
    val freqSh = shDf.filter(col("__df") > maxDocFreq)
      .select(col(idCol), col("shingle"))
    val commonRare = rareSh.alias("a").join(rareSh.alias("b"),
        col("a.shingle") === col("b.shingle") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("common_rare"))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val freqCounts = freqSh.groupBy(col(idCol)).agg(count(lit(1)).as("n_freq"))
    val prelim = commonRare
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), "id_b")
      .join(freqCounts.select(col(idCol).as("id_a"), col("n_freq").as("f_a")),
        Seq("id_a"), "left")
      .join(freqCounts.select(col(idCol).as("id_b"), col("n_freq").as("f_b")),
        Seq("id_b"), "left")
      .withColumn("__max_common", col("common_rare") +
        least(coalesce(col("f_a"), lit(0L)), coalesce(col("f_b"), lit(0L))))
      // keep the pair if EITHER direction could still clear the bar
      .filter(greatest(
        col("__max_common").cast("double") / col("n_a"),
        col("__max_common").cast("double") / col("n_b")) >= minContainment)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val commonFreq = prelim.select(col("id_a"), col("id_b"))
      .join(freqSh.select(col(idCol).as("id_a"), col("shingle")), "id_a")
      .join(freqSh.select(col(idCol).as("id_b"), col("shingle")),
        Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common_freq"))
    val withCommon = prelim.join(commonFreq, Seq("id_a", "id_b"), "left")
      .withColumn("common",
        col("common_rare") + coalesce(col("common_freq"), lit(0L)))
    def direction(cid: String, par: String, nOf: String) = withCommon
      .withColumn("containment",
        Similarity.round6(col("common").cast("double") / col(nOf)))
      .filter(col("containment") >= minContainment)
      .select(col(cid).as("contained_id"), col(par).as("container_id"),
        col("containment"))
    val out = direction("id_a", "id_b", "n_a")
      .unionAll(direction("id_b", "id_a", "n_b"))
    Lifecycle.materializeThenRelease(out, sh, prelim)
  }

  /** Prefix-filtered all-pairs Jaccard join (the SSJoin/PPJoin prefix
    * principle): order every doc's shingles by a global canonical order
    * (document frequency ascending, shingle ascending — rare first),
    * and generate candidates only from each doc's PREFIX of length
    * `|d| − ⌈t·|d|⌉ + 1`. Two sets with J ≥ t must overlap by
    * `⌈t/(1+t)·(|a|+|b|)⌉ > |a| − prefix(a)` tokens, so disjoint
    * prefixes would force the overlap entirely into both suffixes —
    * impossible by the pigeonhole on the canonical order. LOSSLESS by
    * construction (the oracle for the registered query is the plain
    * exact all-pairs SQL — equality, not approximation, is the claim),
    * unlike the [[ngramJaccardPairs]] stop-shingle cap (loses
    * ultra-common-shingle-only pairs) or MinHash (probabilistic).
    *
    * Scale shape: the quadratic candidate join runs over prefix tokens
    * only — roughly the (1−t) rarest fraction of each posting, and the
    * rare END of the frequency spectrum at that — so hot buckets
    * (common shingles) never generate candidates at all. Verification
    * joins candidate pairs back against full shingle sets
    * (|pairs|×|set| — candidates are few AFTER the filter; measured
    * sf0.1: 1,130,536 share-any-shingle pairs shrink to 299,519
    * prefix candidates at t=3/5 and 43,543 with prefix+length filters
    * at t=4/5 — 26×; the reduction grows with t, since prefix length
    * shrinks as (1−t)·|d|).
    * The threshold is a rational tNum/tDen and the accept test is the
    * integer cross-multiplication `common·tDen ≥ tNum·(n_a+n_b−common)`
    * — no float in any decision. */
  def prefixJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, tNum: Long, tDen: Long): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen out of (0,1]")
    val sh = shingles(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
    val ranked = sh.join(freq, Seq("shingle"))
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
          .orderBy(col("__df"), col("shingle"))).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))))
    // prefix length = n − ceil(t·n) + 1, ceil as integer arithmetic
    val prefix = ranked
      .filter(col("__r") <=
        col("__n") - expr(s"($tNum * __n + $tDen - 1) div $tDen") + 1L)
      .select(col(idCol), col("shingle"), col("__n"))
    // length filter (the other standard SSJoin prune): J ≥ t forces
    // t·|bigger| ≤ |smaller|, checked inside the join condition so
    // size-mismatched pairs never reach the distinct/verify stages
    val cand = prefix.alias("a").join(prefix.alias("b"),
        col("a.shingle") === col("b.shingle") &&
          col(s"a.$idCol") < col(s"b.$idCol") &&
          col("a.__n") * tDen >= lit(tNum) * col("b.__n") &&
          col("b.__n") * tDen >= lit(tNum) * col("a.__n"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val common = cand
      .join(sh.select(col(idCol).as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("shingle")),
        Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val out = common
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), "id_b")
      .filter(col("common") * tDen >=
        lit(tNum) * (col("n_a") + col("n_b") - col("common")))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .select(col("id_a"), col("id_b"), col("jaccard"))
    Lifecycle.materializeThenRelease(out, sh)
  }
}
