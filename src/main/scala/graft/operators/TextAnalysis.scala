package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID (marker-word heuristic),
  * and document fingerprinting. All are pure Column expressions
  * (whole-stage-codegen friendly — no UDFs), so they run scan-side at
  * 100 TB with zero shuffles.
  */
object TextAnalysis {

  /** Whitespace token count without materializing the token array. */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  def whitespaceTokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-style pre-tokenizer pattern (GPT-2 family): contractions,
    * optionally space-prefixed letter runs / digit runs / symbol runs,
    * residual whitespace. No lookarounds, so the same pattern runs on
    * Java regex and RE2 engines identically. */
  val BpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Token count under the BPE-ish pre-tokenizer — the right unit when
    * budgeting LLM training data (whitespace counting undercounts
    * punctuation-heavy text). Whitespace-only matches (runs the ` ?`
    * prefixes didn't consume) are not tokens and are filtered out. */
  def bpeTokenCount(text: Column): Column =
    size(filter(regexp_extract_all(text, lit(BpePattern), lit(0)),
      t => t.rlike("\\S")))

  /** Mean token length as exact-int division (deterministic double). */
  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  def punctCount(text: Column): Column = regexp_count(text, lit("[.,;:!?]"))

  def stopwordCount(text: Column): Column =
    regexp_count(lower(text), lit("\\b(the|a|an|and|of|to|in|is|it)\\b"))

  /** Composite quality score in [0,1]-ish: long-enough docs with normal
    * token lengths, some stopwords, and low punctuation density score
    * high. Weights are fixed; every term is a deterministic ratio of
    * exact ints, so the score hash-matches across engines.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenTerm = least(nTok / 50.0, lit(1.0))
    val stopTerm = least(stopwordCount(text).cast("double") * 10.0 /
      greatest(nTok, lit(1.0)), lit(1.0))
    val punctTerm = lit(1.0) - least(punctCount(text).cast("double") * 4.0 /
      greatest(nTok, lit(1.0)), lit(1.0))
    val tokLenTerm = when(avgTokenLen(text).between(3.0, 10.0), lit(1.0))
      .otherwise(lit(0.0))
    lenTerm * 0.4 + stopTerm * 0.2 + punctTerm * 0.2 + tokLenTerm * 0.2
  }

  /** Marker-word language ID over {en,de,fr,es,zh}: counts of a few
    * high-frequency function words per language (CJK codepoints for zh),
    * deterministic priority-order tie-break. A real pipeline swaps in a
    * trained n-gram model; the dataflow shape (scan-side scalar expr) is
    * identical.
    */
  def langScores(text: Column): Map[String, Column] = Map(
    "zh" -> regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]")),
    "en" -> regexp_count(lower(text), lit("\\b(the|and|of|to|is)\\b")),
    "de" -> regexp_count(lower(text), lit("\\b(der|die|das|und|ist)\\b")),
    "fr" -> regexp_count(lower(text), lit("\\b(le|la|les|et|est)\\b")),
    "es" -> regexp_count(lower(text), lit("\\b(el|los|las|y|es)\\b")))

  def langId(text: Column): Column = {
    val s = langScores(text)
    when(s("zh") > 0, lit("zh"))
      .when(s("en") >= s("de") && s("en") >= s("fr") && s("en") >= s("es"), lit("en"))
      .when(s("de") >= s("fr") && s("de") >= s("es"), lit("de"))
      .when(s("fr") >= s("es"), lit("fr"))
      .otherwise(lit("es"))
  }

  /** Canonical content fingerprint: md5 over whitespace-normalized,
    * lowercased text — the exact-dedup key (SURVEY §2 north-star ops). */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Polynomial rolling hash over tokens (base 31, mod 2^31-1): an
    * order-sensitive content fingerprint, cheap to compare and to shard
    * on. Pure higher-order-function fold — codegen'd, no UDF. Portable
    * mode uses the md5-derived token hash so other engines can replay
    * the fold. */
  def rollingHash(text: Column, portable: Boolean = false): Column = {
    val p = lit(Dedup.MersennePrime31)
    aggregate(
      whitespaceTokens(text),
      lit(0L),
      (acc, tok) => pmod(acc * 31L + pmod(Dedup.stringHash(tok, portable), p), p))
  }

  /** Convenience: append the full stat block to a corpus. */
  def withTextStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("avg_token_len", avgTokenLen(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))
}
