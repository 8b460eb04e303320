package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance ≤ 1) equi-join via deletion-neighborhood
  * blocking (the FastSS family, depth 1) — the entity-resolution
  * primitive: match corrupted/typo'd keys (names, SKUs, URLs) against
  * a reference table WITHOUT the O(|a|·|b|) all-pairs Levenshtein scan
  * Spark would otherwise plan for a `levenshtein(x, y) <= 1`
  * predicate.
  *
  * Blocking key = the string itself plus every single-character
  * deletion. Two strings within edit distance 1 always share a key:
  * equal strings share themselves; an insertion's result deletes back
  * to its source; a substitution at position i shares the
  * delete-at-i variant. So the equi-join on variants loses NOTHING
  * (spec pins equality against the naive scan) and each side's row
  * count grows only by its string length. Verification re-checks real
  * `levenshtein` on the candidates — variant collisions (anagram-ish
  * near misses, e.g. transpositions = distance 2) are discharged
  * there, never shipped to the caller.
  *
  * Scale shape: explode (linear in string length), one equi-join on a
  * high-cardinality hash-distributed key, distinct over candidates,
  * codegen'd Levenshtein on survivors. Null strings generate no
  * variants (explode of NULL emits nothing) and therefore join nothing
  * — the corpus NULL convention. Strings here are KEYS (names, codes —
  * tens of chars); for document-length text use the shingle/MinHash
  * family instead, where the deletion neighborhood would be quadratic
  * in document size. */
object FuzzyJoin {

  /** The string plus all single-character-deletion variants. */
  def deletionVariants(s: Column): Column =
    array_union(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, length(s)))))

  /** All (idA, idB, dist) pairs with levenshtein(strA, strB) ≤ 1.
    * Column names of the two sides must be disjoint.
    *
    * Precondition: (id, str) rows must be DISTINCT on each side (the
    * same one-op-per-key contract [[Ivm]]/[[Upsert]] document). The
    * candidate `distinct()` exists to collapse the MULTIPLE shared
    * variants one pair can match through (equal strings share every
    * deletion), and it would also collapse duplicate input rows — so
    * with duplicated (id, str) rows the pair multiplicity diverges
    * from the naive all-pairs scan, which preserves them. Dedup
    * upstream if input rows can repeat.
    *
    * `maxBucket` caps the candidate term per variant bucket (the
    * [[Dedup.cappedBandPairs]] anchor discipline, adapted two-sided):
    * only each side's `maxBucket` smallest-id members per bucket
    * ("anchors") pair with the OTHER side's full membership, so a hot
    * bucket of m_a × m_b candidate slots emits at most
    * maxBucket · (m_a + m_b) — linear in bucket population instead of
    * quadratic. Deletion-neighborhood buckets go hot on low-entropy
    * key regions (shared prefixes, digit runs), and that term is the
    * measured super-linear tail at 10× data. A pair is lost only if
    * BOTH members rank past the cap in EVERY bucket they share —
    * size the cap above the hot-bucket population at which real ed≤1
    * matches still rank (and NEVER silently: surface
    * [[ed1JoinDropped]] next to any capped run). The default is
    * uncapped — exact FastSS. */
  def ed1Join(a: DataFrame, b: DataFrame,
      idA: String, strA: String, idB: String, strB: String,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(maxBucket >= 1, s"maxBucket $maxBucket")
    val va = a.select(col(idA), col(strA),
      explode(deletionVariants(col(strA))).as("__v"))
    val vb = b.select(col(idB), col(strB),
      explode(deletionVariants(col(strB))).as("__v"))
    val candidates =
      if (maxBucket == Int.MaxValue) va.join(vb, "__v")
      else {
        // anchors × all, each direction — the join INPUT is bounded, so
        // the pair volume never materializes quadratically (a post-join
        // rank filter would still generate every slot before dropping it)
        import org.apache.spark.sql.expressions.Window
        val ra = va.withColumn("__rka", row_number().over(
          Window.partitionBy(col("__v")).orderBy(col(idA))))
        val rb = vb.withColumn("__rkb", row_number().over(
          Window.partitionBy(col("__v")).orderBy(col(idB))))
        ra.filter(col("__rka") <= maxBucket).drop("__rka")
          .join(rb.drop("__rkb"), "__v")
          .unionByName(
            ra.drop("__rka")
              .join(rb.filter(col("__rkb") <= maxBucket).drop("__rkb"), "__v"))
      }
    candidates
      .select(col(idA), col(strA), col(idB), col(strB))
      .distinct()
      .withColumn("dist", levenshtein(col(strA), col(strB)))
      .filter(col("dist") <= 1)
      .select(col(idA), col(idB), col("dist"))
  }

  /** Upper bound on candidate SLOTS a capped [[ed1Join]] drops:
    * Σ_buckets max(0, m_a − cap) · max(0, m_b − cap) — the slots where
    * both members rank past the cap. An upper bound on dropped PAIRS
    * (a pair recurs across shared buckets and survives if ANY of them
    * keeps it). One keyed aggregate over the variant rows — the price
    * of never capping silently ([[Dedup.cappedBandDropped]]). */
  def ed1JoinDropped(a: DataFrame, b: DataFrame,
      idA: String, strA: String, idB: String, strB: String,
      maxBucket: Int): Long = {
    val ca = a.select(explode(deletionVariants(col(strA))).as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("ma"))
    val cb = b.select(explode(deletionVariants(col(strB))).as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("mb"))
    ca.join(cb, "__v")
      .agg(coalesce(sum(
        greatest(col("ma") - maxBucket, lit(0L)) *
          greatest(col("mb") - maxBucket, lit(0L))), lit(0L)))
      .head().getLong(0)
  }
}
