package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HLL sketch pins beyond the q152/q153 oracles: partitioning
  * invariance, shard-merge ≡ one-pass, the estimator's error bound in
  * its valid regime, the linear-counting fallback at low cardinality,
  * and the overflow audit at the register cap. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int) =
    spark.range(n).select(concat(lit("key_"), col("id")).as("k"),
      pmod(col("id"), lit(4)).as("g"))

  test("registers are invariant under input partitioning") {
    val df = keys(5000)
    val a = Hll.registers(df, col("k"), Seq("g"))
    val b = Hll.registers(df.repartition(13, col("k")), col("k"), Seq("g"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("merge of 4 shard sketches equals the one-pass register file") {
    val df = keys(8000)
    val shards = (0 until 4).map(p =>
      Hll.registers(df.filter(pmod(xxhash64(col("k")), lit(4)) === p),
        col("k"), Seq("g")))
    val merged = Hll.merge(shards: _*)
    val global = Hll.registers(df, col("k"), Seq("g"))
    assert(merged.exceptAll(global).isEmpty && global.exceptAll(merged).isEmpty)
  }

  test("duplicates don't move the sketch: distinct-ness is structural") {
    val df = keys(3000)
    val dup = df.union(df).union(df.limit(500))
    val a = Hll.registers(df, col("k"), Seq("g"))
    val b = Hll.registers(dup, col("k"), Seq("g"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("raw estimate within 10% in the raw regime (20k distinct/group)") {
    val df = keys(80000) // 20k per group — well above 2.5m = 2560
    val est = Hll.estimate(Hll.registers(df, col("k"), Seq("g")), Seq("g"))
      .select(col("g"), col("est_raw")).as[(Long, Long)].collect()
    assert(est.length == 4)
    est.foreach { case (g, e) =>
      assert(math.abs(e - 20000L) <= 2000L, s"group $g: est $e vs 20000")
    }
  }

  test("linear-counting fallback at low cardinality beats raw") {
    val df = keys(800) // 200 per group — deep small-range regime
    val est = Hll.estimateCorrected(
        Hll.registers(df, col("k"), Seq("g")), Seq("g"))
      .select(col("g"), col("est_raw"), col("est")).as[(Long, Long, Long)]
      .collect()
    est.foreach { case (g, raw, lc) =>
      assert(math.abs(lc - 200L) <= 10L, s"group $g: LC $lc vs 200")
      assert(math.abs(lc - 200L) < math.abs(raw - 200L),
        s"group $g: LC $lc should beat raw $raw")
    }
  }

  test("overflow audit: all registers at the cap still estimates") {
    val regs = spark.range(1024).select(lit(0L).as("g"),
      col("id").as("bucket"), lit(32L).as("register"))
    val est = Hll.estimate(regs, Seq("g"))
      .select(col("n_set"), col("den_scaled"), col("est_raw"))
      .as[(Long, Long, Long)].head()
    assert(est._1 == 1024L && est._2 == 1024L)
    // den = 1024 → est = α·m²·2^32/1024 = α·2^42 ≈ 3.17e12 — positive,
    // no overflow anywhere in the chain
    assert(est._3 == 720541L * ((1048576L * 4294967296L) / 1024L) / 1000000L)
    assert(est._3 > 3000000000000L)
  }
}
