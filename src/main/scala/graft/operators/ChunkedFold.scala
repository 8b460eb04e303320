package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Bounded-memory sequential folds over per-key ordered series.
  *
  * The whole-series shape (`collect_list` + one array fold per key,
  * q121) is right for millions of keys × bounded series, but a single
  * hot entity with a 100M-event stream becomes one unboundable row.
  * This is the chunk + re-fold path for that regime: the series is cut
  * into fixed-size segments, each segment lands as ONE bounded array
  * row, and segments compose with the SAME recurrence inside a
  * streaming per-partition pass — peak memory per task is
  * O(chunkSize), never O(series).
  */
object ChunkedFold {

  /** Per-key integer EWMA — `r' = (num·x + (den−num)·r) div den`,
    * seeded with the first value, identical step-for-step to the
    * single-array `aggregate(...)` fold (ChunkedFoldSpec pins bit
    * equality, including Spark `div`'s truncate-toward-zero on
    * negatives) — computed WITHOUT ever holding a key's full series:
    *
    *  1. `row_number` over (key, orderCols) — a sort-based window that
    *     spills, no per-key array;
    *  2. group to (key, chunk) segment rows, each a ≤ chunkSize array
    *     (in-chunk order restored by sorting on the captured row
    *     number — `collect_list` order is not deterministic);
    *  3. hash-repartition by key, sort partitions by (key, chunk), and
    *     stream-fold consecutive segments per key in one
    *     `mapPartitions` (genuinely imperative: the cross-chunk fold
    *     is sequential by definition).
    *
    * Requirements: orderCols must totally order each key's rows (ties
    * would make the fold order nondeterministic) and the key must be
    * non-null. Output: (keyCol, n_events, ewma). */
  def ewmaChunked(df: DataFrame, keyCol: String,
      orderCols: Seq[org.apache.spark.sql.Column],
      valCol: org.apache.spark.sql.Column,
      num: Int, den: Int, chunkSize: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize $chunkSize")
    require(num >= 0 && den > num, s"need 0 <= num < den, got $num/$den")
    val rest = den - num
    val chunked = df
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)))
      .select(col(keyCol).as("__k"), valCol.cast("long").as("__v"),
        (((col("__rn") - 1) / chunkSize)).cast("long").as("__chunk"),
        col("__rn"))
      .groupBy(col("__k"), col("__chunk"))
      .agg(count(lit(1)).as("__n"),
        sort_array(collect_list(struct(col("__rn"), col("__v"))))
          .as("__arr"))
      .select(col("__k"), col("__chunk"), col("__n"),
        expr("transform(__arr, x -> x.__v)").as("__vals"))
    val outSchema = StructType(Seq(
      StructField(keyCol, df.schema(keyCol).dataType, nullable = false),
      StructField("n_events", LongType, nullable = false),
      StructField("ewma", LongType, nullable = false)))
    chunked
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__chunk"))
      .mapPartitions { rows =>
        val buf = rows.buffered
        new Iterator[Row] {
          def hasNext: Boolean = buf.hasNext
          def next(): Row = {
            val k = buf.head.get(0)
            var n = 0L
            var acc = 0L
            var seeded = false
            while (buf.hasNext && buf.head.get(0) == k) {
              val r = buf.next()
              n += r.getLong(2)
              val vals = r.getSeq[Long](3)
              var i = 0
              while (i < vals.length) {
                val x = vals(i)
                // Spark's long `div` quotient truncates toward zero —
                // plain Java `/`, NOT floorDiv
                if (!seeded) { acc = x; seeded = true }
                else acc = (num * x + rest * acc) / den
                i += 1
              }
            }
            Row(k, n, acc)
          }
        }
      }(Encoders.row(outSchema))
  }
}
