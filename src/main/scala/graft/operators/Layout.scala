package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (z-order) interleaving of two
  * key dimensions into one clustering key, so files written in z-key
  * order each cover a small RECTANGLE of the (x, y) key space instead
  * of a stripe — the layout that lets min/max file statistics prune a
  * 100 TB scan for predicates on EITHER dimension (sort by x alone and
  * a y-predicate prunes nothing; sort by z and both prune).
  *
  * The interleave is pure integer bit arithmetic — per bit i,
  * x's bit lands at 2i and y's at 2i+1 — built from shift/and/multiply
  * terms that whole-stage-codegen into straight-line longs and replay
  * identically in any engine with `>>`/`&` ([[morton2Sql]] emits the
  * twin). No UDF, no lookup table.
  *
  * Two consumption shapes:
  *  - [[zOrderWrite]] (production): `repartitionByRange` on the z key +
  *    sort-within-partitions, so each output file is one z-range. Range
  *    boundaries come from Spark's reservoir sampling — layout quality
  *    is identical run-to-run but file boundaries are not bit-stable,
  *    which a LAYOUT never needs to be (readers see statistics, not
  *    boundaries).
  *  - z-BLOCK analysis (the oracle-gated q112 shape): the top bits of
  *    the z key name a quadtree block (`z div 2^k`), a pure projection
  *    — deterministic in every engine, no sort at all — with a HARD
  *    per-block guarantee: a (2b)-bit z key split into 2^(2b-k) blocks
  *    bounds every block's x-span by 2^⌈k/2⌉ and y-span by 2^⌊k/2⌋.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of x and y (higher bits
    * must be zero — mask or bucket upstream; bits ≤ 31). */
  def morton2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits $bits out of range")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)),
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }
    terms.reduce(_ + _)
  }

  /** The SQL twin of [[morton2]] (DuckDB/ANSI `>>`, `&`). */
  def morton2Sql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x) >> $i) & 1) * ${1L << (2 * i)}",
        s"((($y) >> $i) & 1) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")

  /** Write `df` clustered by the z key: ranged into `nFiles` z-runs,
    * sorted within each, so every file's min/max statistics cover one
    * compact rectangle of (x, y). */
  /** Write `df` as a bucketed (+ per-bucket sorted) table — Spark's
    * answer to co-located joins: two tables bucketed by the same key
    * into the same bucket count join with ZERO exchanges at read time
    * (each bucket i on one side pairs with bucket i on the other), and
    * the per-bucket sort removes the join's Sort too. At 100 TB this
    * moves the entire shuffle cost of every future join on the key to
    * write time, paid once — the standard layout for fact tables that
    * are joined repeatedly on one key.
    *
    * `path` keeps the data out of the default warehouse root (external
    * table); the catalog entry is what carries the bucket spec, so
    * readers MUST come through `spark.table(name)` — reading the
    * parquet directory directly loses the co-location guarantee.
    *
    * SIZE nBuckets AS THE PARALLELISM KNOB: one file per bucket is
    * load-bearing for the zero-exchange plan (a multi-file bucket loses
    * the scan's sort order and the join re-sorts), so nBuckets bounds
    * BOTH scan parallelism and file size — at 100 TB pick nBuckets ≈
    * table bytes / target file size (~256 MB), not a small constant. */
  def bucketedWrite(df: DataFrame, name: String, bucketCol: String,
      nBuckets: Int, path: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // one writer task per bucket ⇒ ONE file per bucket — the shape the
    // scan needs to also expose the per-bucket sortBy as its output
    // ordering (multi-file buckets lose the sort and the join re-sorts)
    df.repartition(nBuckets, col(bucketCol))
      .write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(name)
  }

  def zOrderWrite(df: DataFrame, x: Column, y: Column, bits: Int,
      nFiles: Int, path: String): Unit =
    df.withColumn("__z", morton2(x, y, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
