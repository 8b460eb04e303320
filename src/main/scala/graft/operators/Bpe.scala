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
      scratchDir: Option[String] = None): Seq[Merge] = {
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
    wordCounts(corpus, textCol)
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
    * merges — works for words never seen in training. */
  def segmentExpr(word: Column, merges: Seq[Merge]): Column =
    symbols(merges.foldLeft(sepForm(word)) { (acc, m) =>
      mergeExpr(acc, m.lhs, m.rhs)
    })

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
    words.join(dict, "word")
      .select(col(idCol), col("wp"), posexplode(col("seg")).as(Seq("sp", "tok")))
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("wp"), col("sp"), col("tok")))),
        e => e.getField("tok")).as("tokens"))
  }
}
