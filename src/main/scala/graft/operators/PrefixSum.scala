package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sums — the scan primitive behind global
  * cumulative weights, systematic/PPS sampling, and budget packing.
  *
  * A global running total is the textbook single-task trap: a window
  * `ORDER BY` with no `PARTITION BY` plans as ONE task holding the
  * whole frame. This is the two-phase scan instead: range-partition on
  * the order key, per-partition partial sums (parallel), collect the
  * ≤ nParts partials (a bounded routing collect, not a data collect),
  * broadcast each partition's prefix offset back, and finish with a
  * per-partition window. Wall-clock scales with partition size, the
  * driver sees one long per partition, and the VALUES are partitioning-
  * independent — exact long sums over a total order — which is what
  * lets the DuckDB oracle (a plain windowed sum) pin the distributed
  * result bit-for-bit.
  *
  * The range-partitioned frame is PINNED (persist) across the two
  * phases: `repartitionByRange` derives its boundaries by sampling, so
  * an unpinned recompute between phases could re-draw boundaries and
  * desynchronize the offsets — the eager entry points materialize the
  * result and release the pin ([[Lifecycle.materializeThenRelease]],
  * the bm25TopK contract).
  */
object PrefixSum {

  /** `df` + `cumCol` = Σ valCol over all rows at-or-before this one in
    * `orderCols` order (inclusive). `orderCols` must totally order the
    * frame (ties would make the prefix ambiguous); valCol must be
    * integral — exact longs are the portability contract. `nParts`
    * bounds scan parallelism and driver state (one long each). */
  def globalCumsum(df: DataFrame, orderCols: Seq[Column], valCol: Column,
      cumCol: String, nParts: Int = 64): DataFrame = {
    val (out, pinned) = globalCumsumLazy(df, orderCols, valCol, cumCol, nParts)
    Lifecycle.materializeThenRelease(out, pinned: _*)
  }

  private[graft] def globalCumsumLazy(df: DataFrame,
      orderCols: Seq[Column], valCol: Column, cumCol: String,
      nParts: Int): (DataFrame, Seq[DataFrame]) = {
    require(nParts >= 1, s"nParts $nParts")
    val parted = df
      .repartitionByRange(nParts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // phase 1: per-range totals (also populates the pin, fixing the
    // sampled range boundaries); the collect is ≤ nParts longs
    val partials = parted.groupBy(col("__pid"))
      .agg(sum(valCol.cast("long")).as("__psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = partials.keys.toSeq.sorted
    val offsets = pids.zip(
      pids.scanLeft(0L)((acc, p) => acc + partials(p)).init)
    // The offsets ride back as a broadcast-joined (pid → offset) frame,
    // NOT a chained `when` literal: a fold of nParts `when` branches is
    // an expression tree that grows with nParts (a codegen/analysis
    // hazard at nParts=10k), while a broadcast hash join of nParts rows
    // stays flat at any width.
    val session = df.sparkSession
    val offFrame = session.createDataFrame(offsets.map {
      case (p, off) => org.apache.spark.sql.Row(p, off) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__off_pid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // phase 2: per-partition running sum + the broadcast offset. The
    // window partitions by __pid, so no task ever sees more than one
    // range's rows.
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = parted
      .join(broadcast(offFrame), col("__pid") === col("__off_pid"))
      .withColumn(cumCol, col("__off") + sum(valCol.cast("long")).over(w))
      .drop("__pid", "__off_pid", "__off")
    (out, Seq(parted))
  }

  /** Global equi-depth boundaries — distributed order statistics: the
    * `valCol` value of the row at rank ⌈i·n/B⌉ for i = 1..B under the
    * `orderCols` total order. Rank is a weight-1 [[globalCumsum]], so
    * no task ever holds more than one range partition — the shape that
    * replaces both a single-task global sort AND a full-column
    * collect. Target ranks are computed driver-side from one count
    * (B longs of state); refuses loudly when n < B (two buckets would
    * share a boundary row and silently collapse). Output:
    * (bucket_idx, boundary) — boundary_i bounds the i-th of B
    * equal-count buckets from above. */
  def equiDepthBoundaries(df: DataFrame, orderCols: Seq[Column],
      valCol: Column, b: Int, nParts: Int = 64): DataFrame = {
    require(b >= 1, s"b $b")
    val n = df.count()
    require(n >= b, s"n=$n rows < b=$b buckets")
    val targets = (1 to b).map(i => (i.toLong * n + b - 1) / b)
    require(targets.distinct.size == b, s"duplicate target ranks for n=$n b=$b")
    val rankToBucket = targets.zipWithIndex.map { case (rk, i) =>
      rk -> (i + 1).toLong }.toMap
    val (ranked, pinned) = globalCumsumLazy(df, orderCols, lit(1L),
      "__rank", nParts)
    val bucketCol = rankToBucket.foldLeft(lit(-1L)) { case (acc, (rk, i)) =>
      when(col("__rank") === rk, lit(i)).otherwise(acc)
    }
    val out = ranked
      .filter(col("__rank").isin(rankToBucket.keys.toSeq: _*))
      .select(bucketCol.as("bucket_idx"), valCol.as("boundary"))
    Lifecycle.materializeThenRelease(out, pinned: _*)
  }

  /** Systematic probability-proportional-to-size sampling off the
    * cumulative weight: a row is selected iff its weight interval
    * `(cum − w, cum]` crosses a multiple of `step` — every `step`
    * weight units pick exactly one row, so a row's pick rate is ~w/step
    * with NO randomness at all (determinism comes from the order key,
    * not a seed; pair with [[DataMix.shuffleShards]] upstream if the
    * order correlates with content). Integer-exact in both engines. */
  def systematicSample(df: DataFrame, orderCols: Seq[Column],
      weightCol: Column, step: Long, nParts: Int = 64): DataFrame = {
    require(step >= 1, s"step $step")
    val (cum, pinned) = globalCumsumLazy(df, orderCols, weightCol,
      "__cw", nParts)
    // integral `div`, not `/` (double division loses exactness past 2^53)
    val out = cum
      .withColumn("__prev", col("__cw") - weightCol.cast("long"))
      .filter(expr(s"(__cw div ${step}L) > (__prev div ${step}L)"))
      .drop("__prev")
      .withColumnRenamed("__cw", "cum_weight")
    Lifecycle.materializeThenRelease(out, pinned: _*)
  }
}
