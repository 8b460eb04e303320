package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
