package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Doc-level multimodal fusion: the composition the individual
  * operators exist for — image-text pair deduplication where candidate
  * pairs come from EITHER modality's blocking (text MinHash+LSH bands ∪
  * image embedding LSH buckets) and survive a fused verification score
  * over both modalities (exact text Jaccard + image cosine).
  *
  * A text-only near-dup pass misses pairs whose prose was rewritten
  * around the same image; an image-only pass misses pairs with the same
  * caption over re-encoded images. The union of blocked candidate sets
  * catches both, and the fused score keeps a pair only when the
  * modalities agree enough in aggregate.
  *
  * Image embeddings come from [[Multimodal.withFeatures]] (stub codec —
  * md5-derived, so the whole pipeline replays bit-exactly in the
  * oracle; swap the codec for a real model without touching the
  * dataflow).
  *
  * Scale: both candidate generators are blocked (banding / bucket
  * equi-joins — keyed shuffles, quadratic only within blocks);
  * verification touches candidates only, never the pair space. The
  * per-doc signal tables (embedding+bucket+norm, banded signatures)
  * materialize once as scratch tables — at 100 TB these are the
  * enriched-metadata tables a multimodal pipeline persists anyway.
  * Storage lifecycle per [[Lifecycle]]: nothing stays pinned.
  */
object Fusion {

  /** @param minFused keep pairs with (jaccard + cosine)/2 ≥ this
    *   (applied in exact ppm integers — see `fused_ppm` below).
    * @param numHashes,bands text-side MinHash band shape; pass
    *   `bands <= 0` to size BOTH from the corpus count via
    *   [[Dedup.adaptiveBandShape]] (rows grow with log n at constant
    *   LSH threshold ≈ 0.707). A FIXED shape is the text-side
    *   super-linear cliff (the mirror of the image one below):
    *   per-band noise collisions scale as n²·s̄^rows, so at fixed rows
    *   the candidate volume — and with it the fused verify — grows
    *   quadratically with dup density. Pin the shape only for an
    *   external replay (the q79 oracle).
    * @param nBits image-LSH bit-width; pass <= 0 to size it from the
    *   corpus count via [[Similarity.adaptiveHyperplaneBits]] (one
    *   cheap count action). A FIXED width is the same cliff on the
    *   image side: buckets saturate as the corpus grows and
    *   within-bucket pair generation goes quadratic (measured: 10×
    *   docs at 8 fixed bits → 104× image candidates → 16× wall;
    *   adaptive width restores ~linear candidate growth). Pin it only
    *   when an external replay (the q79 oracle) needs a fixed bucket
    *   function.
    * @param maxTextBucket per-bucket candidate cap for the text bands
    *   ([[Dedup.cappedBandPairs]] — anchors preserve bucket
    *   connectivity; dropped non-anchor pairs are counted and logged,
    *   never silent). > 0 = cap at that many anchors; 0 = auto (256,
    *   only meaningful protection at pathological dup density); < 0 =
    *   uncapped (exact replay mode — what the pinned q79 oracle
    *   needs). Capping can drop true pairs whose ONLY blocking
    *   evidence was a non-anchor text collision, so it is off unless
    *   asked for.
    * @return (id_a, id_b, jaccard, cosine, fused_ppm), materialized.
    *   `fused_ppm` = (jaccard_ppm + cosine_ppm) div 2 as an exact long:
    *   rounding (j+c)/2 to 6 dp in DOUBLE hit a real cross-engine
    *   half-tie at sf1.0 ((0.96+0.383997)/2 = 0.6719985 — Spark's
    *   BigDecimal HALF_UP of the double's exact expansion vs DuckDB's
    *   scaled-multiply round disagree by 1 ulp of the 6th decimal), so
    *   the fused score is integer end-to-end; jaccard/cosine stay
    *   double for human consumption.
    */
  def imageTextNearDupPairs(
      df: DataFrame, idCol: String, textCol: String, binCol: String,
      dim: Int, shingleN: Int = 3, numHashes: Int = 16, bands: Int = -1,
      nBits: Int = -1, minFused: Double = 0.6, seed: Long = 42L,
      planeSeed: Long = 7L, portable: Boolean = false,
      maxTextBucket: Int = -1): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    // one corpus count sizes both modalities' blocking (skipped when
    // both are pinned)
    lazy val corpusN = df.count()
    val imgBits =
      if (nBits > 0) nBits
      else Similarity.adaptiveHyperplaneBits(corpusN)
    val (nh, nBands) =
      if (bands > 0) (numHashes, bands)
      else { val (h, b, _) = Dedup.adaptiveBandShape(corpusN); (h, b) }
    require(nh % nBands == 0, "bands must divide numHashes")
    val cap =
      if (maxTextBucket > 0) maxTextBucket
      else if (maxTextBucket == 0) 256
      else Int.MaxValue

    // per-doc image signals: embedding + hyperplane LSH bucket + norm
    val signals = Lifecycle.materializeToScratch(
      Multimodal.withFeatures(df.select(col(idCol), col(binCol)), binCol, dim)
        // null-payload docs join no near-dup relation (NullTextSpec's
        // rule): unfiltered they'd take hyperplane bucket 0 (NULL
        // projections bit by bit) and generate candidates that only
        // die at verification
        .filter(col("features").isNotNull)
        .select(col(idCol), col("features"),
          Similarity.hyperplaneBucket(col("features"), dim, imgBits, planeSeed)
            .as("ibucket"),
          Similarity.norm(col("features")).as("inorm")))

    // text-modality candidates: scan-side MinHash signatures → banding
    val banded = Lifecycle.materializeToScratch(
      Dedup.bandedSignatures(
        Dedup.withMinHashSignature(df, idCol, textCol, shingleN,
          nh, seed, portable),
        idCol, nBands, nh / nBands, portable))
    val textCand =
      if (cap == Int.MaxValue)
        banded.alias("x").join(banded.alias("y"),
            col("x.band_idx") === col("y.band_idx") &&
              col("x.band_hash") === col("y.band_hash") &&
              col(s"x.$idCol") < col(s"y.$idCol"))
          .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      else {
        val dropped = Dedup.cappedBandDropped(banded, cap)
        if (dropped > 0)
          System.err.println(s"[graft.fusion] text-band cap $cap dropped " +
            s"$dropped non-anchor candidate pairs (bucket connectivity " +
            "preserved via anchors)")
        Dedup.cappedBandPairs(banded, idCol, cap)
      }

    // image-modality candidates: same-bucket self-join
    val imgCand = signals.alias("x").join(signals.alias("y"),
        col("x.ibucket") === col("y.ibucket") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))

    // union of modality candidate sets, then verified once per pair
    val cand = Lifecycle.materializeToScratch(
      textCand.union(imgCand).distinct())

    // exact text Jaccard over full shingle sets, candidates only; a
    // banded-only pair sharing zero shingles scores jaccard 0
    val sh = Dedup.shingles(df, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val common = cand
      .join(sh.select(col(idCol).as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("shingle")),
        Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
    val c = coalesce(col("common"), lit(0L))
    val out = cand
      .join(common, Seq("id_a", "id_b"), "left")
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        c.cast("double") / (col("n_a") + col("n_b") - c))
      .join(signals.select(col(idCol).as("id_a"),
        col("features").as("__fa"), col("inorm").as("__na")), "id_a")
      .join(signals.select(col(idCol).as("id_b"),
        col("features").as("__fb"), col("inorm").as("__nb")), "id_b")
      .withColumn("cosine",
        Similarity.round6(Similarity.dot(col("__fa"), col("__fb")) /
          (col("__na") * col("__nb"))))
      // exact integer fusion: jaccard as a ppm rational, the 6-dp
      // cosine recovered to its exact ppm integer (floor(x*1e6+0.5)
      // undoes the representation error of the rounded double), mean
      // by truncating div — no float rounding anywhere near the
      // threshold comparison
      .withColumn("__jac_ppm", expr(
        "(1000000 * coalesce(common, 0)) div (n_a + n_b - coalesce(common, 0))"))
      .withColumn("__cos_ppm",
        floor(col("cosine") * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("fused_ppm", expr("(__jac_ppm + __cos_ppm) div 2"))
      .filter(col("fused_ppm") >= math.round(minFused * 1e6))
      .select(col("id_a"), col("id_b"), col("jaccard"), col("cosine"),
        col("fused_ppm"))
    Lifecycle.materializeThenRelease(out, sh)
  }
}
