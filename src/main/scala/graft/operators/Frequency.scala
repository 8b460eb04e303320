package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Dedup.{MersennePrime31 => P}

/** Frequent-item (heavy-hitter) extraction at corpus scale: the
  * vocabulary question every training-data pipeline asks — boilerplate
  * phrases, over-represented domains, hot n-grams — where the naive
  * `GROUP BY term` shuffles one row per DISTINCT term (at 100 TB of
  * text, billions of keys, almost all of which are singletons nobody
  * asked about).
  *
  * Two-pass sketch-then-verify instead: pass 1 runs a Misra-Gries
  * summary of capacity k INSIDE each partition (mapPartitions — the
  * genuinely per-partition imperative case) and ships only the ≤ k
  * surviving candidate terms per partition. The MG guarantee
  * transfers: any term with global count > n/k must exceed its local
  * n_p/k share in ≥1 partition (averaging argument), so the union of
  * per-partition survivors is a SUPERSET of every true heavy hitter.
  * Pass 2 broadcast-semi-joins the token stream against the candidate
  * set and counts exactly — false candidates die on the threshold,
  * true counts are exact, so the result is IDENTICAL to the naive
  * GROUP BY + HAVING while shuffling only candidate-term rows.
  */
object Frequency {

  /** Misra-Gries summary of one partition: at most k surviving terms;
    * every term with local count > n_p/k survives. O(1) amortized per
    * token (each decrement round removes ≥1 of ≤ k+1 entries and is
    * paid for by the arrivals that filled them). */
  private[operators] def misraGries(
      it: Iterator[String], k: Int): Iterator[String] = {
    val counts = new java.util.HashMap[String, Long](k * 2)
    while (it.hasNext) {
      val t = it.next()
      val c = counts.get(t)
      if (c != 0L) counts.put(t, c + 1)
      else if (counts.size < k) counts.put(t, 1L)
      else {
        val e = counts.entrySet().iterator()
        while (e.hasNext) {
          val en = e.next()
          if (en.getValue == 1L) e.remove() else en.setValue(en.getValue - 1)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counts.keySet().iterator().asScala
  }

  /** All terms with exact count ≥ minCount, as (termCol, cnt) —
    * bit-identical to `GROUP BY termCol HAVING count(*) >= minCount`,
    * computed with the two-pass candidate shape above. `totalCount`
    * skips the sizing count job when the caller already knows n.
    *
    * The MG capacity is n/minCount + 1 (the guarantee needs
    * k ≥ n/minCount); thresholds below n/10^7 would mean >10M-entry
    * per-partition maps — at that point the naive GROUP BY is the
    * right tool, so we refuse loudly instead of degrading silently. */
  def heavyHitters(
      df: DataFrame, termCol: String, minCount: Long,
      totalCount: Option[Long] = None): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val spark = df.sparkSession
    import spark.implicits._
    val terms = df.select(col(termCol).cast("string"))
      .filter(col(termCol).isNotNull)
    val n = totalCount.getOrElse(terms.count())
    val cap = n / minCount + 1
    require(cap <= 10_000_000,
      s"heavyHitters: minCount=$minCount over n=$n needs MG capacity $cap " +
        "(>10M); use a plain GROUP BY for thresholds this low")
    val k = cap.toInt
    val candidates = terms.as[String]
      .mapPartitions(it => misraGries(it, k))
      .toDF(termCol).distinct()
    terms
      .join(broadcast(candidates), termCol)
      .groupBy(col(termCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Per-depth-row bucket columns for the count-min hash family:
    * bucket_i = ((h·a_i + b_i) mod p) mod width over the 60-bit term
    * hash reduced mod p — the same seed-derived universal hashes as
    * MinHash, so any engine replays them. */
  private def cmBuckets(termCol: String, depth: Int, width: Int,
      seed: Long, portable: Boolean) = {
    val h = pmod(Dedup.stringHash(col(termCol), portable), lit(P))
    Dedup.hashParams(depth, seed).map { case (a, b) =>
      pmod(pmod(h * a + b, lit(P)), lit(width.toLong))
    }
  }

  /** Count-min sketch as a relational build: (row_idx, bucket,
    * cell_cnt) cell counts, at most depth·width rows TOTAL regardless
    * of vocabulary — the aggregation partial-combines map-side into
    * that fixed-size state, so the shuffle is a few KB where a naive
    * `GROUP BY term` moves every distinct term. Cells are mergeable
    * across corpora/windows by cell-wise sum; estimates
    * ([[countMinEstimate]]) are one-sided: est ≥ true, and
    * est ≤ true + 2n/width with prob ≥ 1 − 2^-depth per row. */
  def countMinTable(df: DataFrame, termCol: String,
      depth: Int = 4, width: Int = 256, seed: Long = 42L,
      portable: Boolean = false): DataFrame =
    df.filter(col(termCol).isNotNull)
      .select(posexplode(array(
        cmBuckets(termCol, depth, width, seed, portable): _*)))
      .groupBy(col("pos"), col("col"))
      .agg(count(lit(1)).as("cell_cnt"))
      .select(col("pos").as("row_idx"), col("col").as("bucket"),
        col("cell_cnt"))

  /** Point-frequency estimates for `terms` (one column: termCol)
    * against a [[countMinTable]] sketch: min over the depth cells,
    * absent cells read 0. The sketch is at most depth·width rows, so
    * it broadcasts. */
  def countMinEstimate(sketch: DataFrame, terms: DataFrame,
      termCol: String, depth: Int = 4, width: Int = 256,
      seed: Long = 42L, portable: Boolean = false): DataFrame =
    terms
      .select(col(termCol), posexplode(array(
        cmBuckets(termCol, depth, width, seed, portable): _*)))
      .withColumnRenamed("pos", "row_idx")
      .withColumnRenamed("col", "bucket")
      .join(broadcast(sketch), Seq("row_idx", "bucket"), "left")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("cell_cnt"), lit(0L))).as("cm_est"))

  /** Join-cardinality estimate from two [[countMinTable]] sketches
    * built with the SAME depth/width/seed: |A ⋈_key B| =
    * Σ_k f_A(k)·f_B(k), and each sketch row's cell-wise inner product
    * Σ_b cmA[d,b]·cmB[d,b] OVERESTIMATES that sum (matching keys land
    * in the same cell by construction; hash collisions only add
    * cross-terms), so the min over depth rows is the tightest
    * one-sided bound — the classic CM/AGMS inner-product estimator.
    * This is the planning primitive that decides salting / broadcast /
    * bucketing BEFORE running a 100 TB join: two KB-sized mergeable
    * sketches instead of a dry-run shuffle. Returns one row:
    * (est_join_size). */
  def countMinJoinSize(sketchA: DataFrame, sketchB: DataFrame): DataFrame = {
    val prod = sketchA
      .select(col("row_idx"), col("bucket"), col("cell_cnt").as("__ca"))
      .join(sketchB.select(col("row_idx"), col("bucket"),
        col("cell_cnt").as("__cb")), Seq("row_idx", "bucket"))
      .groupBy(col("row_idx"))
      .agg(sum(col("__ca") * col("__cb")).as("__rowEst"))
    // a sketch row with NO overlapping cells proves the join is empty:
    // its bound is 0, which the inner join above would silently drop —
    // re-anchor on every row the A-sketch has
    sketchA.select(col("row_idx")).distinct()
      .join(prod, Seq("row_idx"), "left")
      .agg(min(coalesce(col("__rowEst"), lit(0L))).as("est_join_size"))
  }

  /** Power-of-two histogram bin of a non-negative long: the number of
    * binary digits (`length(bin(v))` = ⌊log₂ v⌋ + 1 for v > 0) — an
    * integer-exact, cross-engine bin function (both Spark and DuckDB
    * ship `bin()`; no float log at bucket boundaries). Nonpositive
    * values land in bin 0. Bin k > 0 covers [2^(k-1), 2^k − 1]. */
  def log2Bin(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(v > 0L, length(bin(v)).cast("int")).otherwise(lit(0))

  /** Mergeable quantile sketch as a per-key power-of-two histogram:
    * (key, bin, cnt) with at most 65 bins per key — completing the
    * sketch family (KMV distinct, MG heavy hitters, CM frequencies,
    * now quantiles). The aggregation partial-combines map-side into
    * ≤ 65·keys groups, so the shuffle carries bins, where an EXACT
    * per-key quantile ([[graft.queries]] q62) must move every distinct
    * value to its key's reducer — the difference between KBs and the
    * full column at 100 TB. Histograms merge across corpora/windows by
    * (key, bin)-wise sum: hist(A ⊎ B) = hist(A) + hist(B). */
  def log2Histogram(df: DataFrame, keyCol: String,
      valCol: String): DataFrame =
    df.groupBy(col(keyCol), log2Bin(col(valCol)).as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Quantile estimate from a [[log2Histogram]]: the target rank is
    * integer-exact, target = ⌈(qNum/qDen)·n⌉ = (qNum·n + qDen − 1) div
    * qDen, and the answering bin is the first whose cumulative count
    * reaches it. Returns per key: n, the bin, and the bin's value
    * bounds [est_lo, est_hi] — a 2× relative-error bracket (est_hi <
    * 2·est_lo) that is GUARANTEED to contain the exact q-quantile,
    * because bin membership is rank-preserving. The bound is the
    * verifiable contract (q100 joins it against the exact quantile);
    * report est_hi when a single point estimate is needed. */
  def histQuantile(hist: DataFrame, keyCol: String,
      qNum: Long, qDen: Long): DataFrame = {
    require(qNum > 0 && qNum <= qDen, "quantile must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(col(keyCol))
    hist
      .withColumn("__cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wn))
      .withColumn("__target",
        expr(s"(${qNum}L * n + ${qDen - 1}L) div ${qDen}L"))
      .filter(col("__cum") >= col("__target") &&
        col("__cum") - col("cnt") < col("__target"))
      .select(col(keyCol), col("n"), col("bin"),
        when(col("bin") > 0, expr("shiftleft(CAST(1 AS BIGINT), bin - 1)"))
          .otherwise(lit(0L)).as("est_lo"),
        when(col("bin") > 0, expr("shiftleft(CAST(1 AS BIGINT), bin) - 1"))
          .otherwise(lit(0L)).as("est_hi"))
  }

  /** EXACT per-key k-th smallest value WITHOUT a global sort —
    * distributed selection by iterative histogram refinement. The
    * sort-based exact quantile (q100's window form) shuffles every row
    * to its key's reducer and sorts; at 100 TB that is the whole
    * dataset through the exchange, concentrated on #keys reducers.
    * This operator never shuffles data at all: each pass scans the
    * (filtered) input once, histograms the live value range into
    * 2^bits buckets per key (map-side-combined groupBy whose OUTPUT is
    * ≤ keys·2^bits tiny rows), the driver locates the bucket holding
    * the target rank and recurses into it. Range shrinks 2^bits× per
    * pass ⇒ ≤ ⌈64/bits⌉ passes worst case (2 passes for money cents).
    * Scans cost more than one sort-pass reads, but scans are the cheap
    * currency at scale — no exchange, no spill, no skewed reducer.
    *
    * Driver state is O(#keys), the same contract as every codebook /
    * medoid collect in this repo: keys are a GROUPING (flags, langs,
    * cohorts), not an id space. `rankOf` maps a key's row count to the
    * target rank in [1, n] — default the lower median (n+1)/2, the
    * exact selection q100's oracle pins. Values must be integral.
    */
  def exactKth(df: DataFrame, keyCol: String, valCol: String,
      rankOf: Long => Long = n => (n + 1) / 2,
      bits: Int = 12): DataFrame =
    exactRanks(df, keyCol, valCol, Seq("kth" -> rankOf), bits).drop("tag")

  /** Multi-rank variant of [[exactKth]]: several target ranks per key
    * (e.g. all three quartiles) refined in the SAME passes — each pass
    * still scans the data once; a row is histogrammed once per tag
    * whose live range contains it (ranges disjoin quickly after pass
    * 1, so the per-tag overlap collapses). Output: (key, tag, n, kth),
    * one row per (key, tag). */
  /** [[exactRanks]] over DOUBLE values — exact selection on floats with
    * no caller-side cents lifting. The integral machinery can't be
    * reused directly: the order-preserving IEEE-754 bit lift
    * ([[graft.functions.IeeeSortable]]) spans nearly the whole 64-bit
    * domain, so `hi - lo` range arithmetic overflows. Instead the
    * refinement is a RADIX descent over the lifted UNSIGNED bit-string:
    * pass p histograms the next `bits`-wide window
    * (`shiftrightunsigned` + mask — shift/compare only, overflow-free
    * by construction over the full domain), the driver picks the
    * bucket holding the target rank and extends the prefix, and after
    * exactly 64/bits passes the prefix IS the answer's lifted value,
    * un-lifted back to the exact double the data contains. Same scale
    * contract as [[exactRanks]]: zero data-row exchanges, one scan per
    * pass, ≤ keys·2^bits histogram rows to the driver per pass.
    *
    * Value order is the IEEE total order (pinned in FrequencySpec):
    * -Inf < … < -0.0 < +0.0 < … < +Inf < NaN, with -0.0 and +0.0
    * distinct — engines that collapse the two (or sort NaN first)
    * need upstream normalization for oracle parity.
    */
  def exactRanksDouble(df: DataFrame, keyCol: String, valCol: String,
      ranks: Seq[(String, Long => Long)],
      bits: Int = 16): DataFrame = {
    require(Seq(8, 16).contains(bits),
      s"bits must divide 64 and keep the histogram bounded (8 or 16), " +
        s"got $bits")
    require(ranks.nonEmpty && ranks.map(_._1).distinct.size == ranks.size,
      "ranks need at least one entry with distinct tags")
    require(Seq("double", "float").contains(
      df.schema(valCol).dataType.typeName),
      s"exactRanksDouble selects over double values; '$valCol' is " +
        s"${df.schema(valCol).dataType} — use exactRanks for integrals")
    val spark = df.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val keyField = df.schema(keyCol)
    val src = df.select(col(keyCol),
      call_function(graft.functions.VectorFunctions.ieeeSortableName,
        col(valCol).cast("double")).as("__u"))
    val buckets = 1L << bits

    // pass 0: per-key count + the same loud NULL rejection as the
    // integral path (a silently skipped NULL shifts every rank)
    val initRows = src.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        count(when(col("__u").isNull, 1)).as("nNullVals"))
      .collect()
    require(initRows.length.toLong * buckets <= (64L << 20),
      s"exactRanksDouble driver histogram would hold ${initRows.length} " +
        s"keys x $buckets buckets rows per pass; keys are a grouping, " +
        "not an id space — reduce key cardinality or lower bits")
    case class St(key: Any, tag: String, prefix: Long, rank: Long, n: Long)
    var states = initRows.toSeq.flatMap { r =>
      require(r.get(0) != null,
        s"exactRanksDouble: NULL values in key column '$keyCol' — " +
          "selection keys must be non-null (filter or fill upstream)")
      require(r.getLong(2) == 0L,
        s"exactRanksDouble: ${r.getLong(2)} NULL '$valCol' rows under " +
          s"key ${r.get(0)} — values must be non-null (filter upstream)")
      val n = r.getLong(1)
      ranks.map { case (tag, rankOf) =>
        val rank = rankOf(n)
        require(rank >= 1 && rank <= n,
          s"rank '$tag'($n) = $rank out of [1, $n] for key ${r.get(0)}")
        St(r.get(0), tag, 0L, rank, n)
      }
    }

    import org.apache.spark.sql.types._
    val stSchema = StructType(Seq(keyField.copy(name = "__k"),
      StructField("__tag", StringType), StructField("__pfx", LongType)))
    val passes = 64 / bits
    for (p <- 0 until passes) {
      val shift = 64 - (p + 1) * bits
      // tags sharing a (key, prefix) histogram ONCE (all of them in
      // pass 0); __tag carries the group's first tag as its identity
      val groups = states.groupBy(s => (s.key, s.prefix))
      val groupTag = groups.map { case (gk, ss) => gk -> ss.head.tag }
      val stRows = groups.keys.toSeq.map { case gk @ (k, pfx) =>
        org.apache.spark.sql.Row(k, groupTag(gk), pfx)
      }
      val stDf = spark.createDataFrame(
        spark.sparkContext.parallelize(stRows.toIndexedSeq, 1), stSchema)
      val hist = src
        .join(broadcast(stDf), col(keyCol) === col("__k"))
        // pass 0 has an empty prefix (and a 64-shift would be a Java
        // shift-count no-op): every row of the key participates
        .filter(if (p == 0) lit(true)
          else expr(s"shiftrightunsigned(__u, ${shift + bits})")
            === col("__pfx"))
        .groupBy(col(keyCol), col("__tag"),
          expr(s"shiftrightunsigned(__u, $shift) & ${buckets - 1}L")
            .as("__b"))
        .agg(count(lit(1)).as("__c"))
        .collect()
        .groupBy(r => (r.get(0), r.getString(1)))
      states = states.map { s =>
        val bs = hist((s.key, groupTag((s.key, s.prefix))))
          .map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
        var acc = 0L
        val (bStar, inBucket) =
          bs.collectFirst { case (b, c) if { acc += c; acc >= s.rank } =>
            (b, s.rank - (acc - c))
          }.get
        s.copy(prefix = (s.prefix << bits) | bStar, rank = inBucket)
      }
    }
    val outSchema = StructType(Seq(keyField.copy(name = keyCol),
      StructField("tag", StringType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("kth", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        states.map(s => org.apache.spark.sql.Row(s.key, s.tag, s.n,
          graft.functions.IeeeSortable.unlift(s.prefix))).toIndexedSeq,
        1), outSchema)
  }

  def exactRanks(df: DataFrame, keyCol: String, valCol: String,
      ranks: Seq[(String, Long => Long)],
      bits: Int = 12): DataFrame = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1,20], got $bits")
    require(ranks.nonEmpty && ranks.map(_._1).distinct.size == ranks.size,
      "ranks need at least one entry with distinct tags")
    val spark = df.sparkSession
    val keyField = df.schema(keyCol)
    require(Seq("long", "int", "short").contains(
      df.schema(valCol).dataType.typeName),
      s"exactRanks selects over integral values; '$valCol' is " +
        s"${df.schema(valCol).dataType}")
    val src = df.select(col(keyCol), col(valCol).cast("long").as("__v"))
    val buckets = 1L << bits

    // pass 0: per-key count + live range (one scan), fanned out per tag.
    // NULLs are rejected loudly in the SAME pass (no extra scan): a NULL
    // key would never satisfy the keyCol === __k refinement join and a
    // NULL value is skipped by min/max but counted by count(1), so
    // either would silently shift ranks — the non-null contract is as
    // hard as the integral-value require above.
    case class St(key: Any, tag: String, lo: Long, hi: Long,
        rank: Long, n: Long)
    val initRows = src.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), min(col("__v")).as("lo"),
        max(col("__v")).as("hi"),
        count(when(col("__v").isNull, 1)).as("nNullVals"))
      .collect()
    // Driver state (and each refinement pass's histogram collect) is
    // O(#keys · 2^bits): keys are a GROUPING, not an id space. Fail
    // loudly before collecting a histogram that would flatten the
    // driver (the Pca.fit-headroom-style guard) instead of OOMing
    // passes later.
    require(initRows.length.toLong * buckets <= (64L << 20),
      s"exactRanks driver histogram would hold ${initRows.length} keys x " +
        s"$buckets buckets rows per pass; keys are a grouping, not an id " +
        "space — reduce key cardinality or lower bits")
    val init = initRows.flatMap { r =>
      require(r.get(0) != null,
        s"exactRanks: NULL values in key column '$keyCol' — selection " +
          "keys must be non-null (filter or fill upstream)")
      require(r.getLong(4) == 0L,
        s"exactRanks: ${r.getLong(4)} NULL '$valCol' rows under key " +
          s"${r.get(0)} — values must be non-null (filter upstream)")
      val n = r.getLong(1)
      require(BigInt(r.getLong(3)) - BigInt(r.getLong(2)) <
        BigInt(Long.MaxValue), "value range spans the full int64 domain")
      ranks.map { case (tag, rankOf) =>
        val rank = rankOf(n)
        require(rank >= 1 && rank <= n,
          s"rank '$tag'($n) = $rank out of [1, $n] for key ${r.get(0)}")
        St(r.get(0), tag, r.getLong(2), r.getLong(3), rank, n)
      }
    }
    var done = init.filter(s => s.lo == s.hi).toSeq
    var live = init.filterNot(s => s.lo == s.hi).toSeq

    import org.apache.spark.sql.types._
    val stSchema = StructType(Seq(keyField.copy(name = "__k"),
      StructField("__tag", StringType), StructField("__lo", LongType),
      StructField("__hi", LongType), StructField("__w", LongType)))
    while (live.nonEmpty) {
      // tags sharing an identical live range — ALL of them in pass 1,
      // since every tag starts at the key's full [min, max] — histogram
      // ONCE per distinct (key, range) and serve every tag from it; the
      // __tag column carries the range's first tag as its identity
      val ranges = live.groupBy(s => (s.key, s.lo, s.hi))
      val width = ranges.keys.map { case (k, lo, hi) =>
        (k, lo, hi) -> ((hi - lo) / buckets + 1)
      }.toMap
      val rangeTag = ranges.map { case (rk, ss) => rk -> ss.head.tag }
      val stRows = ranges.keys.toSeq.map { case rk @ (k, lo, hi) =>
        org.apache.spark.sql.Row(k, rangeTag(rk), lo, hi, width(rk))
      }
      val stDf = spark.createDataFrame(
        spark.sparkContext.parallelize(stRows.toIndexedSeq, 1), stSchema)
      val hist = src
        .join(broadcast(stDf), col(keyCol) === col("__k"))
        .filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
        // `div`, not `/`: Column./ on longs is DOUBLE division, which
        // rounds across bucket boundaries once a key's live range
        // exceeds 2^53 — the driver-side bounds use exact long
        // arithmetic, so the two sides would disagree and return a
        // silently wrong "exact" k-th. Integral div matches exactly
        // over the full int64 domain the scaladoc advertises.
        .groupBy(col(keyCol), col("__tag"),
          expr("(__v - __lo) div __w").as("__b"))
        .agg(count(lit(1)).as("__c"))
        .collect()
        .groupBy(r => (r.get(0), r.getString(1)))
      live = live.flatMap { s =>
        val rk = (s.key, s.lo, s.hi)
        val lo = s.lo; val w = width(rk)
        val rank = s.rank
        val bs = hist((s.key, rangeTag(rk))).map(r => (r.getLong(2), r.getLong(3)))
          .sortBy(_._1)
        val (bStar, inBucket) = {
          var acc = 0L
          bs.collectFirst { case (b, c) if { acc += c; acc >= rank } =>
            (b, rank - (acc - c))
          }.get
        }
        val nLo = lo + bStar * w
        val nHi = math.min(s.hi, nLo + w - 1)
        if (nLo == nHi) {
          done = done :+ St(s.key, s.tag, nLo, nHi, inBucket, s.n); None
        } else Some(St(s.key, s.tag, nLo, nHi, inBucket, s.n))
      }
    }
    val outSchema = StructType(Seq(keyField.copy(name = keyCol),
      StructField("tag", StringType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("kth", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        done.map(s =>
          org.apache.spark.sql.Row(s.key, s.tag, s.n, s.lo)).toIndexedSeq,
        1), outSchema)
  }
}
