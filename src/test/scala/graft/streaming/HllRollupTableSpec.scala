package graft.streaming

import graft.SparkSpec
import graft.operators.Hll
import org.apache.spark.sql.functions._

/** Rollup-table pins beyond the q156 oracle: incremental maintain ≡
  * one-shot recompute at the register level, monotone registers
  * across generations (the insert-only contract), and the CdcTable
  * crash rule — a torn generation is never flipped to. */
class HllRollupTableSpec extends SparkSpec {

  private def batch(lo: Int, hi: Int) =
    spark.range(lo, hi).select(concat(lit("u"), col("id")).as("k"),
      pmod(col("id"), lit(3)).as("g"))

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft_hll_rollup_").toString

  test("three incremental maintains equal the one-shot sketch") {
    val dir = tmp()
    val t = new HllRollupTable(spark, dir, Seq("g"))
    t.maintain(batch(0, 4000), col("k"))
    t.maintain(batch(3000, 8000), col("k")) // overlap on purpose
    t.maintain(batch(8000, 9000), col("k"))
    assert(t.generation == 2)
    val oneShot = Hll.registers(batch(0, 9000), col("k"), Seq("g"))
    val rolled = t.registers()
    assert(rolled.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(rolled).isEmpty)
  }

  test("registers are monotone non-decreasing across generations") {
    val dir = tmp()
    val t = new HllRollupTable(spark, dir, Seq("g"))
    t.maintain(batch(0, 2000), col("k"))
    t.maintain(batch(2000, 5000), col("k"))
    val g0 = t.registers(0).withColumnRenamed("register", "r0")
    val g1 = t.registers(1).withColumnRenamed("register", "r1")
    // every gen-0 register must still exist in gen 1, at >= its value
    assert(g0.join(g1, Seq("g", "bucket"), "left")
      .filter(col("r1").isNull || col("r1") < col("r0")).isEmpty)
  }

  test("a torn generation (no _SUCCESS) is never flipped to") {
    val dir = tmp()
    val t = new HllRollupTable(spark, dir, Seq("g"))
    t.maintain(batch(0, 1000), col("k"))
    // simulate a crash mid-write of gen=1: directory exists, no marker
    val torn = new java.io.File(s"$dir/gen=1")
    torn.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/gen=1/part-zzz.parquet"), "garbage")
    val recovered = new HllRollupTable(spark, dir, Seq("g"))
    assert(recovered.generation == 0)
    // next maintain overwrites the torn dir and commits cleanly
    recovered.maintain(batch(1000, 2000), col("k"))
    assert(recovered.generation == 1)
    val oneShot = Hll.registers(batch(0, 2000), col("k"), Seq("g"))
    assert(recovered.registers().exceptAll(oneShot).isEmpty)
  }

  test("estimates read path: raw estimate tracks the growing table") {
    import spark.implicits._
    val dir = tmp()
    val t = new HllRollupTable(spark, dir, Seq("g"))
    t.maintain(batch(0, 9000), col("k"))
    t.maintain(batch(9000, 60000), col("k"))
    def est(g: Int): Map[Long, Long] = t.estimates(g)
      .select(col("g"), col("est_raw")).as[(Long, Long)].collect().toMap
    val (e0, e1) = (est(0), est(1))
    (0L to 2L).foreach { g =>
      assert(e0(g) < e1(g), s"estimate must grow: $g ${e0(g)} ${e1(g)}")
      assert(math.abs(e1(g) - 20000L) <= 2000L, s"group $g: ${e1(g)}")
    }
  }
}
