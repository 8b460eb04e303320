package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction + tokenization — the real
  * tokenizer behind token-budget accounting ([[DataMix
  * .packByTokenBudget]]'s unit), upgrading q95's single-step pair
  * counts and [[TextAnalysis.bpeTokenCount]]'s pre-tokenizer proxy to
  * a learned subword vocabulary.
  *
  * Classic word-level BPE (Sennrich et al.), arranged for Spark's cost
  * model: training iterates over the DISTINCT-WORD frequency table —
  * ONE corpus scan builds (word, cnt), and every merge step is a
  * vocab-sized pair count + a driver collect of exactly one argmax
  * row + a scan-side string substitution. At 100 TB the corpus is
  * touched once; the loop's working set is the vocabulary (bounded,
  * ~10⁶ rows), persisted and re-materialized per step so plan depth
  * stays flat across iterations.
  *
  * Determinism (the cross-engine + partitioning contract): pair counts
  * are exact longs; the winning pair breaks ties on
  * (count DESC, left ASC, right ASC); substitution is the engines'
  * shared `replace` semantics — leftmost-first, non-overlapping,
  * continue AFTER the replacement — which on a separator-delimited
  * symbol string is exactly BPE's greedy left-to-right merge
  * ("a a a" + merge(a,a) → "aa a", pinned in BpeSpec). Words are held
  * as `␟s₁␟s₂␟…␟` strings (US separator <US>, absent from text by
  * the vocab filter), so one merge is one literal
  * `replace(w, ␟l␟r␟, ␟lr␟)` — no per-row imperative code anywhere.
  *
  * No end-of-word marker: merges never cross word boundaries and the
  * token stream reassembles per word, so the marker would only rename
  * tokens; documented divergence from tokenizers that need to invert
  * concatenation.
  */
object Bpe {

  val Sep = "\u001f"

  final case class Merge(step: Int, lhs: String, rhs: String,
      pair_cnt: Long)

  /** Corpus-convention word frequencies: lower → trim → whitespace
    * split (the q64/q95 tokenizer), separator-bearing words excluded
    * so the symbol encoding below is injective. */
  def wordCounts(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(explode(TextAnalysis.whitespaceTokens(
        lower(trim(col(textCol))))).as("word"))
      .filter(col("word") =!= "" && !col("word").contains(Sep))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** `abc` → `␟a␟b␟c␟`: every symbol delimited on both sides, so a
    * pair substring match cannot split a multi-char symbol. */
  private[operators] def sepForm(word: Column): Column =
    concat(lit(Sep), regexp_replace(word, "(.)", "$1" + Sep))

  private def symbols(w: Column): Column =
    filter(split(w, Sep), x => x =!= "")

  /** Adjacent-symbol pair counts over a (w, cnt) vocab frame:
    * (lhs, rhs, pair_cnt). */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val t = col("t")
    vocab
      .select(symbols(col("w")).as("t"), col("cnt"))
      .filter(size(t) >= 2)
      .select(col("cnt"), explode(transform(sequence(lit(0), size(t) - 2),
        j => struct(element_at(t, j + 1).as("lhs"),
          element_at(t, j + 2).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("cnt")).as("pair_cnt"))
  }

  /** One merge applied to the sep-string form. */
  private def mergeExpr(w: Column, lhs: String, rhs: String): Column =
    call_function("replace", w,
      lit(Sep + lhs + Sep + rhs + Sep), lit(Sep + lhs + rhs + Sep))

  /** Learn `nMerges` merges. Stops early when no adjacent pair is left
    * (fully merged vocabulary). Each step materializes the rewritten
    * vocab to scratch parquet so iteration i+1's plan is a flat file
    * scan, not an i-deep replace/cache chain — chained persists OOM'd
    * the driver on plan-string rendering by ~30 iterations, and a
    * vocab generation on disk doubles as a resume point. The scratch
    * tree is deleted on completion when owned by this call; pass
    * `scratchDir` to keep generations (or to resume externally). */
  def trainMerges(corpus: DataFrame, textCol: String, nMerges: Int,
      scratchDir: Option[String] = None, maxVocab: Int = -1): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges $nMerges")
    val spark = corpus.sparkSession
    val owned = scratchDir.isEmpty
    // Default under Lifecycle.scratchRoot (honors graft.scratch.dir, so a
    // cluster deploy pointing that conf at shared storage keeps executor
    // writes reachable); a driver-local temp dir would silently break
    // multi-node.
    val dir = scratchDir.getOrElse(
      s"${Lifecycle.scratchRoot(spark)}/bpe${System.nanoTime()}")
    def gen(i: Int) = s"$dir/v$i"
    // default UNCAPPED (the q139/q140 pinned oracles replay the full
    // vocab); pass maxVocab to train on the same deterministic cut as
    // the capped local trainer
    cappedWordCounts(corpus, textCol, maxVocab)
      .select(sepForm(col("word")).as("w"), col("cnt"))
      .write.mode("overwrite").parquet(gen(0))
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    var i = 1
    while (i <= nMerges && !done) {
      val vocab = spark.read.parquet(gen(i - 1))
      val best = pairCounts(vocab)
        .orderBy(col("pair_cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val b = best.head
        val m = Merge(i, b.getString(0), b.getString(1), b.getLong(2))
        out += m
        vocab.withColumn("w", mergeExpr(col("w"), m.lhs, m.rhs))
          .write.mode("overwrite").parquet(gen(i))
        i += 1
      }
    }
    if (owned) {
      try Lifecycle.deleteRecursively(java.nio.file.Paths.get(dir))
      catch { case _: Throwable => () }
    }
    out.toSeq
  }

  /** Segmentation of one word under the ordered merge list: the same
    * literal replace chain the trainer applied, folded left over the
    * merges — works for words never seen in training.
    *
    * DEPTH WARNING: the fold builds an O(nMerges)-deep expression tree
    * — fine at the q139/q140 gate sizes, but a production 32k-merge
    * vocab would produce an expression janino refuses (the
    * PqNearestCode failure class). Past ~100 merges use
    * [[segmentCol]] / [[applyMergesFast]]: constant-size generated
    * code, identical output (spec-pinned). */
  def segmentExpr(word: Column, merges: Seq[Merge]): Column =
    symbols(merges.foldLeft(sepForm(word)) { (acc, m) =>
      mergeExpr(acc, m.lhs, m.rhs)
    })

  /** One merge applied to a symbol array — the JVM reference of
    * [[mergeExpr]]'s `replace` semantics, byte-for-byte: leftmost
    * first, non-overlapping, the scan resumes AFTER the matched region
    * of the SOURCE. Because the pattern `␟l␟r␟` consumes the separator
    * after `r`, the symbol following a match loses its leading
    * separator and can never begin (or join) the next match:
    * `a a a a` + merge(a,a) → `[aa, a, a]` (NOT `[aa, aa]`), and
    * `a a a a a` → `[aa, a, aa]` — verified against both engines'
    * replace and pinned in BpeSpec. */
  private[operators] def applyMergeJvm(syms: Array[String], l: String,
      r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = syms.length
    var i = 0
    while (i < n) {
      if (i + 1 < n && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        if (i + 2 < n) out += syms(i + 2)
        i += 3
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Code-POINT symbol split — [[sepForm]]'s `(.)` regex matches one
    * code point, so the JVM twins must not split surrogate pairs the
    * way `String.map` (code units) would. */
  private[operators] def splitCodePoints(word: String): Array[String] = {
    val out = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var o = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out(o) = new String(Character.toChars(cp))
      i += Character.charCount(cp)
      o += 1
    }
    out
  }

  /** JVM reference of [[segmentExpr]]: the full ordered merge chain
    * applied to one word. A symbol-SET pre-check skips merges whose
    * sides can't both be present (O(1) per skipped merge), so cost is
    * O(nMerges + applied·|word|) — the shape that makes a 32k-merge
    * vocabulary usable. The set is add-only (a superset), which can
    * only cause a futile O(|word|) scan, never a wrong skip. */
  def segmentWord(word: String, merges: Seq[Merge]): Array[String] =
    segmentWordPairs(word, merges.map(_.lhs).toArray,
      merges.map(_.rhs).toArray)

  /** Array-pair core of [[segmentWord]] — the form [[graft.functions
    * .BpeSegmentWord]] calls from generated code (no Merge boxing on
    * the scan path). */
  def segmentWordPairs(word: String, lhs: Array[String],
      rhs: Array[String]): Array[String] = {
    var syms = splitCodePoints(word)
    if (syms.length == 0) return syms
    val present = new java.util.HashSet[String]()
    syms.foreach(present.add)
    var k = 0
    while (k < lhs.length) {
      if (present.contains(lhs(k)) && present.contains(rhs(k))) {
        val next = applyMergeJvm(syms, lhs(k), rhs(k))
        if (next.length != syms.length) {
          present.add(lhs(k) + rhs(k))
          syms = next
        }
      }
      k += 1
    }
    syms
  }

  /** Spark's string ordering (UTF8String binary = code-point order) on
    * JVM strings — `String.compareTo` is UTF-16 code-UNIT order, which
    * disagrees for supplementary-plane characters, and the driver-side
    * trainer's tie-break must match the distributed `orderBy`
    * exactly. */
  private[operators] def codePointLt(a: String, b: String): Boolean = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    a.length - i < b.length - j
  }

  /** [[trainMerges]] computed DRIVER-SIDE from the collected word-
    * frequency table: ONE corpus scan + one bounded-metadata collect
    * (the distinct-word vocabulary — the [[ProductQuant]] codebook
    * pattern, never the corpus), then the merge loop runs in memory
    * with incremental pair-count maintenance. Produces the IDENTICAL
    * merge list to the distributed loop (same pair counting, same
    * rewrite semantics, same (count DESC, lhs, rhs) tie-break in
    * Spark's string order — equality spec-pinned), but each merge is a
    * hash-map update instead of one Spark job + one parquet
    * generation, so a production 10⁴–10⁵-merge vocabulary trains in
    * seconds where the per-merge-job form needs 32k sequential jobs.
    * Use [[trainMerges]] when the vocab genuinely exceeds driver
    * memory (rare: even a 10⁸-word web vocab is ~GBs) or when the
    * on-disk per-generation resume points matter. */
  def trainMergesLocal(corpus: DataFrame, textCol: String,
      nMerges: Int, maxVocab: Int = DefaultMaxVocab): Seq[Merge] =
    trainMergesLocalMeta(corpus, textCol, nMerges, maxVocab).merges

  /** Driver-vocab bound for [[trainMergesLocal]]: 4M distinct words ≈
    * low hundreds of driver MBs — far above any curated corpus's
    * vocabulary, far below the ~10⁸ distinct "words" of raw 100 TB web
    * text, whose unbounded collect was the last unbounded driver
    * collect on a production path. Rare words below the cut can't win
    * merges anyway at production merge counts; the truncation is the
    * standard BPE min-frequency cutoff expressed as a top-N. */
  val DefaultMaxVocab: Int = 4 << 20

  /** Top-`maxVocab` words by (cnt DESC, word ASC — Spark's binary
    * string order, so the cut is deterministic and engine-replayable):
    * plans as TakeOrderedAndProject, a BOUNDED per-task + driver heap,
    * never a full-vocab global sort or an unbounded collect.
    * `maxVocab <= 0` = uncapped (pinned replays of the full-vocab
    * trainers). */
  def cappedWordCounts(corpus: DataFrame, textCol: String,
      maxVocab: Int): DataFrame = {
    val wc = wordCounts(corpus, textCol)
    if (maxVocab <= 0) wc
    else wc.orderBy(col("cnt").desc, col("word")).limit(maxVocab)
  }

  /** Training provenance alongside the merges — persisted-model
    * metadata so a capped vocabulary is auditable, never silent:
    * `vocabSize` is the collected (post-cap) size and `capped` says
    * whether the cap actually bit. */
  final case class TrainResult(merges: Seq[Merge], maxVocab: Int,
      vocabSize: Long, capped: Boolean)

  /** [[trainMergesLocal]] with the meta: one corpus scan, one BOUNDED
    * driver collect (≤ maxVocab rows via TakeOrderedAndProject), then
    * the in-memory merge loop. Capped-local ≡ capped-distributed
    * merges is spec-pinned (same vocabulary cut, same tie-breaks). */
  def trainMergesLocalMeta(corpus: DataFrame, textCol: String,
      nMerges: Int, maxVocab: Int = DefaultMaxVocab): TrainResult = {
    require(nMerges >= 1, s"nMerges $nMerges")
    val wc = cappedWordCounts(corpus, textCol, maxVocab).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    TrainResult(trainMergesFromCounts(wc, nMerges), maxVocab,
      wc.length.toLong, maxVocab > 0 && wc.length == maxVocab)
  }

  /** The in-memory merge loop over (word, count) rows. */
  def trainMergesFromCounts(wordCnt: Seq[(String, Long)],
      nMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val words: Array[Array[String]] =
      wordCnt.map(w => splitCodePoints(w._1)).toArray
    val cnts: Array[Long] = wordCnt.map(_._2).toArray
    val pc = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[Int]]
    def addPairs(w: Int, mult: Long, index: Boolean): Unit = {
      val s = words(w)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        pc.update(p, pc.getOrElse(p, 0L) + mult)
        if (index) occ.getOrElseUpdate(p,
          mutable.ArrayBuffer.empty[Int]) += w
        i += 1
      }
    }
    words.indices.foreach(w => addPairs(w, cnts(w), index = true))
    def beats(a: ((String, String), Long), b: ((String, String), Long)): Boolean =
      a._2 > b._2 || (a._2 == b._2 &&
        (codePointLt(a._1._1, b._1._1) || (a._1._1 == b._1._1 &&
          codePointLt(a._1._2, b._1._2))))
    val out = mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      var best: ((String, String), Long) = null
      pc.foreach { e =>
        if (e._2 > 0 && (best == null || beats(e, best))) best = e
      }
      if (best == null) done = true
      else {
        val ((l, r), c) = best
        out += Merge(step, l, r, c)
        // rewrite only words that (might) contain the pair; entries in
        // occ can be stale after earlier rewrites, so re-verify. The
        // quirky non-overlap rule means a rewritten word CAN still
        // contain (l, r) — counts are maintained by exact delta, and
        // the same pair may legitimately win again at a later step
        // (exactly like the distributed recount would).
        val affected = occ.getOrElse((l, r),
          mutable.ArrayBuffer.empty[Int]).distinct
        affected.foreach { w =>
          val s = words(w)
          var has = false
          var i = 0
          while (!has && i < s.length - 1) {
            has = s(i) == l && s(i + 1) == r
            i += 1
          }
          if (has) {
            addPairs(w, -cnts(w), index = false)
            words(w) = applyMergeJvm(s, l, r)
            addPairs(w, cnts(w), index = true)
          }
        }
        step += 1
      }
    }
    out.toSeq
  }

  /** [[segmentExpr]] with CONSTANT-SIZE generated code: the merge list
    * rides along as a codegen reference object ([[graft.functions
    * .BpeSegmentWord]], the PqNearestCode pattern) instead of an
    * O(nMerges)-deep replace tree — janino-safe at any vocabulary
    * size, identical output (spec-pinned vs the fold, including the
    * non-overlap quirk). */
  def segmentCol(word: Column, merges: Seq[Merge]): Column =
    graft.functions.BpeFunctions.segment(word, merges.map(m => (m.lhs, m.rhs)))

  /** Per-document subword token COUNTS under the learned vocabulary —
    * `size(tokens)` of [[applyMergesFast]] without materializing the
    * token arrays: a doc's token count is the sum of its word
    * occurrences' segment LENGTHS, so the dictionary carries one int
    * per distinct word and the per-doc aggregate is a plain long sum —
    * no array collect, no sort, no flatten (guide §1.2: don't compute
    * what you throw away; the budget/packing consumers only ever read
    * the count). Row set and values are identical to
    * `applyMergesFast(...).select(id, size(tokens))` by construction
    * (docs with no qualifying word are absent from both). */
  def tokenCounts(corpus: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    graft.functions.BpeFunctions.register(corpus.sparkSession)
    val words = corpus
      .select(col(idCol), explode(TextAnalysis.whitespaceTokens(
        lower(trim(col(textCol))))).as("word"))
      .filter(col("word") =!= "" && !col("word").contains(Sep))
    val dict = words.select(col("word")).distinct()
      .select(col("word"),
        size(segmentCol(col("word"), merges)).cast("long").as("__nseg"))
    words.join(dict, "word")
      .groupBy(col(idCol))
      .agg(sum(col("__nseg")).as("n_bpe_tokens"))
  }

  /** [[applyMerges]] on the constant-size segmentation path — the
    * 10⁴⁺-merge production tokenizer. Same distinct-word dictionary
    * join, same document-order reassembly. */
  def applyMergesFast(corpus: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    graft.functions.BpeFunctions.register(corpus.sparkSession)
    val words = corpus
      .select(col(idCol), posexplode(TextAnalysis.whitespaceTokens(
        lower(trim(col(textCol))))).as(Seq("wp", "word")))
      .filter(col("word") =!= "" && !col("word").contains(Sep))
    val dict = words.select(col("word")).distinct()
      .withColumn("seg", segmentCol(col("word"), merges))
    reassemble(words.join(dict, "word"), idCol)
  }

  /** Document-order reassembly shared by the tokenizers: collect each
    * word occurrence's WHOLE segment array keyed by word position and
    * flatten in position order — identical tokens to exploding every
    * subword (a segment is already in symbol order), but the per-doc
    * shuffle carries one row per word occurrence instead of one per
    * TOKEN (guide §2.3: shuffle fewer, wider rows over more, narrower
    * ones when the payload is reassembled anyway). `wp` is unique per
    * doc, so the struct sort never compares the array field. */
  private def reassemble(occ: DataFrame, idCol: String): DataFrame =
    occ.groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("wp"), col("seg")))),
        e => e.getField("seg"))).as("tokens"))

  /** Tokenize a corpus under a learned vocabulary:
    * (idCol, tokens: array<string>) with tokens in document order.
    * The replace chain runs once per DISTINCT word (dictionary
    * pattern — at 100 TB the dictionary is the vocab, not the
    * corpus); occurrences re-assemble by (word position, symbol
    * position). */
  def applyMerges(corpus: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val words = corpus
      .select(col(idCol), posexplode(TextAnalysis.whitespaceTokens(
        lower(trim(col(textCol))))).as(Seq("wp", "word")))
      .filter(col("word") =!= "" && !col("word").contains(Sep))
    val dict = words.select(col("word")).distinct()
      .withColumn("seg", segmentExpr(col("word"), merges))
    reassemble(words.join(dict, "word"), idCol)
  }
}
