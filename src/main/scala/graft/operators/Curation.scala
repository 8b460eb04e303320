package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines — the quality
  * and leakage filters that run between raw crawl and tokenization:
  * repetition metrics (the classic "Gopher rules" family), corpus-level
  * boilerplate detection, and train/test contamination checks.
  *
  * Scale notes: repetition metrics are per-document (scan-side explode +
  * two keyed aggregations on doc_id — partitions evenly); boilerplate
  * and contamination reuse the [[Dedup.shingles]] machinery, so their
  * only shuffles are keyed on the shingle hash, and contamination caps
  * hot shingles exactly like the capped Jaccard path (a shingle shared
  * by half the corpus is noise for leakage purposes and would otherwise
  * be the quadratic term).
  */
object Curation {

  /** Per-document repetition metrics (Gopher-style quality filters):
    * duplicate-token fraction and most-frequent-bigram fraction.
    * Output: (id, n_tokens, dup_token_frac, top_bigram_frac); docs with
    * fewer than 2 tokens get top_bigram_frac 0.
    *
    * Pure scan-side: the top-bigram multiplicity is the longest equal
    * run of the SORTED per-doc bigram array, computed with an
    * `aggregate` higher-order fold — per-document metrics never shuffle
    * (the first explode+groupBy formulation cost 14s at sf0.1 against
    * this one's ~1s, and at 100 TB would shuffle the whole corpus's
    * bigram multiset). Each array is materialized in its own projection
    * before the HOF references it (lambda-inlined expressions
    * re-evaluate per element). */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withToks = Dedup.widen(df, idCol).select(col(idCol),
      TextAnalysis.whitespaceTokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    val nTok = size(toks)
    val withBg = withToks.select(col(idCol),
      nTok.as("n_tokens"),
      size(array_distinct(toks)).as("__n_distinct"),
      array_sort(when(nTok >= 2,
        transform(sequence(lit(0), nTok - 2),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>"))).as("__bg"))
    val bg = col("__bg")
    val topRun = aggregate(bg,
      struct(lit(0L).as("best"), lit(0L).as("run"),
        lit(null).cast("string").as("prev")),
      (acc, x) => {
        val run = when(acc.getField("prev").isNotNull &&
          x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
        struct(greatest(acc.getField("best"), run).as("best"),
          run.as("run"), x.as("prev"))
      },
      acc => acc.getField("best"))
    withBg.select(col(idCol), col("n_tokens"),
      ((col("n_tokens") - col("__n_distinct")).cast("double") /
        greatest(col("n_tokens"), lit(1))).as("dup_token_frac"),
      when(size(bg) > 0, topRun.cast("double") / size(bg))
        .otherwise(lit(0.0)).as("top_bigram_frac"))
  }

  /** Corpus-level boilerplate candidates: word n-grams present in at
    * least `minDocs` distinct documents (the no-newline analogue of
    * repeated-line removal: headers, disclaimers, navigation chrome
    * surface as high-document-frequency n-grams). One shuffle on the
    * shingle key. */
  def boilerplateNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int): DataFrame =
    Dedup.shingles(df, idCol, textCol, n) // distinct per (doc, shingle)
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Train/test contamination: for every test document, how many train
    * documents share at least one word n-gram with it (and how many
    * (train-doc, shingle) hits in total). Shingles in more than
    * `maxDocFreq` documents are excluded — ultra-common n-grams are not
    * leakage evidence and are the quadratic bucket term at scale.
    *
    * @param split DataFrame carrying `idCol`, `textCol`, and `splitCol`
    *              with values "train"/"test" (e.g. [[DataMix.trainTestSplit]]).
    */
  def splitContamination(split: DataFrame, idCol: String, textCol: String,
      splitCol: String, n: Int, maxDocFreq: Int): DataFrame = {
    // Shingle generation carries the split label through (no join back
    // to the corpus) and dedups per-doc with scan-side array_distinct
    // (no corpus-wide (doc, shingle) DISTINCT shuffle — round-3 rewrite,
    // 8.7s → see NOTES). The df-count pass stays SEPARATE from the pair
    // join on purpose: counting first is a skew-safe partial aggregate,
    // whereas collecting doc lists per shingle before the cap filter
    // would buffer a corpus-hot shingle's full posting list in one
    // aggregation buffer.
    val src = Dedup.widen(split, idCol)
    val withToks = src.select(col(idCol), col(splitCol).as("__split"),
      TextAnalysis.whitespaceTokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    val shArr = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    ).otherwise(array(concat_ws(" ", toks)))
    val docSh = withToks
      // null-text docs contribute no shingles (Dedup.shingles NULL rule)
      .filter(toks.isNotNull)
      .select(col(idCol), col("__split"), explode(array_distinct(shArr)).as("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rare = docSh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select(col("shingle"))
    val rareSh = docSh.join(rare, "shingle")
    val testSh = rareSh.filter(col("__split") === "test")
      .select(col(idCol).as("test_id"), col("shingle"))
    val trainSh = rareSh.filter(col("__split") === "train")
      .select(col(idCol).as("train_id"), col("shingle"))
    // countDistinct would EXPAND the joined pairs 2x; pre-aggregating on
    // (test, train) keeps both phases map-side-combinable.
    val out = testSh.join(trainSh, "shingle")
      .groupBy(col("test_id"), col("train_id"))
      .agg(count(lit(1)).as("__hits"))
      .groupBy(col("test_id"))
      .agg(count(lit(1)).as("n_train_docs"),
        sum(col("__hits")).as("n_hits"))
    // EAGER (see [[Lifecycle]]): the report materializes now and the
    // pinned (doc, shingle) frame unpins before return.
    Lifecycle.materializeThenRelease(out, docSh)
  }

  /** Fixed-size sliding-window document chunking — the step that turns
    * variable-length documents into trainer-shaped sequences. Windows
    * of `chunkTokens` tokens every `stride` tokens (overlap =
    * chunkTokens - stride); the last window may be short; docs shorter
    * than one window yield exactly one chunk. Pure scan-side: token
    * array → per-window slices → posexplode; no shuffle, no state —
    * at 100 TB chunking runs at parquet-scan speed and composes with
    * [[DataMix.packByTokenBudget]] downstream. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkTokens >= stride,
      "need 0 < stride <= chunkTokens")
    val withToks = df.select(col(idCol),
      TextAnalysis.whitespaceTokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    val nChunks = greatest(lit(1L),
      ceil((size(toks).cast("double") - chunkTokens) / stride).cast("long")
        + 1L)
    val chunks = transform(sequence(lit(0L), nChunks - 1),
      i => concat_ws(" ", slice(toks, (i * stride + 1).cast("int"),
        lit(chunkTokens))))
    withToks
      .select(col(idCol), posexplode(chunks))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_text"))
  }

  /** PII redaction: emails, phone-number-shaped digit runs, and IPv4
    * addresses replaced with typed placeholders, with per-doc hit
    * counts for audit. Patterns stay within the regex subset Java and
    * RE2 evaluate identically, so the oracle replays the scrub
    * byte-for-byte. Scan-side regexp chain — zero shuffles. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9][0-9() -]{7,}[0-9]"

  /** Corpus-wide segment-level dedup (the C4 "remove repeated lines
    * across the corpus" rule): every segment keeps only its FIRST
    * occurrence — ordered by (doc id, position) — and documents are
    * reassembled from their surviving segments. Works over any
    * segmentation: rows of (id, idx, segment) from [[chunk]], a
    * sentence split ([[dedupSentences]]), or line explode. Output:
    * (id, n_segments, n_kept, text) with `text` rebuilt from kept
    * segments in order.
    *
    * Scale: one shuffle keyed on the segment (the first-occurrence
    * window — hash keys, partitions evenly; a hot boilerplate sentence
    * is exactly ONE window partition no matter how many copies) and
    * one keyed on the doc id for reassembly. */
  def dedupSegments(segs: DataFrame, idCol: String, idxCol: String,
      segCol: String, joinSep: String): DataFrame = {
    val firstW = Window.partitionBy(col(segCol))
      .orderBy(col(idCol), col(idxCol))
    val marked = segs.withColumn("__keep",
      row_number().over(firstW) === 1)
    marked.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
            when(col("__keep"), struct(col(idxCol), col(segCol))))),
          x => x.getField(segCol)), joinSep).as("text"))
  }

  /** [[dedupSegments]] at sentence granularity (". "-separated). */
  def dedupSentences(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val segs = df
      .select(col(idCol), posexplode(split(col(textCol), "\\. ")))
      .withColumnRenamed("pos", "__idx")
      .withColumnRenamed("col", "__seg")
      .filter(trim(col("__seg")) =!= "")
    dedupSegments(segs, idCol, "__idx", "__seg", ". ")
  }

  /** Maximal cross-document repeated spans at token-shingle
    * granularity — the distributed approximation of suffix-array
    * substring dedup ("dedup repeated substrings, not just whole
    * documents"): token positions covered by any n-gram occurring in
    * ≥ minDocs distinct docs merge into maximal coverage intervals per
    * doc; intervals of ≥ minTokens tokens come back as (id,
    * span_start, span_end, span_tokens) removal candidates (0-based
    * inclusive token positions).
    *
    * Scale shape: one positional-shingle pass (scan-side), one keyed
    * shuffle on the shingle to find cross-doc duplicates, one semi
    * join back, then a per-document window (gaps-and-islands merge) —
    * partitions by doc, bounded by doc length. No pairwise joins at
    * all: unlike pair-based near-dup, cost is linear in the number of
    * duplicated positions, so a boilerplate sentence shared by a
    * million docs costs a million interval rows, never a million²
    * pair rows. */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int, minTokens: Int): DataFrame = {
    val src = df
      .select(col(idCol), TextAnalysis.whitespaceTokens(col(textCol)).as("__toks"))
      .filter(col("__toks").isNotNull && size(col("__toks")) >= n)
    val toks = col("__toks")
    val sh = src.select(col(idCol),
        posexplode(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
      .withColumnRenamed("col", "shingle")
    val dup = sh.groupBy(col("shingle"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("shingle"))
    val covered = sh.join(dup, "shingle")
      .select(col(idCol), col("pos"), (col("pos") + (n - 1)).as("endpos"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val islands = covered
      .withColumn("__prevmax",
        max(col("endpos")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__prevmax").isNull || col("pos") > col("__prevmax") + 1, 1)
          .otherwise(0))
      .withColumn("__island", sum(col("__new")).over(w))
    islands.groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).as("span_start"), max(col("endpos")).as("span_end"))
      .withColumn("span_tokens", col("span_end") - col("span_start") + 1)
      .filter(col("span_tokens") >= minTokens)
      .select(col(idCol), col("span_start"), col("span_end"), col("span_tokens"))
  }

  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(EmailRe)))
      .withColumn("n_ips", regexp_count(t, lit(Ipv4Re)))
      .withColumn("n_phones", regexp_count(t, lit(PhoneRe)))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"))
  }
}
