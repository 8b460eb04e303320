package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[FastRound]] must be BIT-EQUAL to Spark's `round(double, s)` — it
  * replaces it inside every similarity hot loop, and the DuckDB oracle
  * parity story leans on Spark-round semantics. Fuzzed, adversarial,
  * and slow-path-window cases. */
class FastRoundSpec extends SparkSpec {

  import spark.implicits._

  private def sparkRound(x: Double, s: Int): Double = {
    // the reference implementation, verbatim from catalyst's RoundBase
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  test("fuzz: bit-equal to Spark round on uniform + near-boundary doubles") {
    val rnd = new scala.util.Random(42)
    val uniform = Array.fill(200000)(rnd.nextDouble() * 2 - 1)
    val wide = Array.fill(100000)((rnd.nextDouble() * 2 - 1) * math.pow(10, rnd.nextInt(12)))
    // adversarial: exact half-boundaries and ±ulp neighbours at scale 6
    val halves = (0 until 50000).map { i =>
      val n = rnd.nextInt(2000000) - 1000000
      val h = (n + 0.5) / 1e6
      Seq(h, Math.nextUp(h), Math.nextDown(h), -h)
    }.flatten.toArray
    // exact 6-dp representables (must stay fast-path AND exact)
    val exact = (0 until 50000).map(i => (rnd.nextInt(2000000) - 1000000) / 1e6.toDouble).toArray
    for (s <- Seq(0, 2, 6, 9)) {
      (uniform ++ wide ++ halves ++ exact).foreach { x =>
        val got = FastRound.round(x, s)
        val want = sparkRound(x, s)
        assert(java.lang.Double.doubleToLongBits(got) ==
          java.lang.Double.doubleToLongBits(want),
          s"x=$x scale=$s got=$got want=$want")
      }
    }
  }

  test("specials: NaN, infinities, zeros, huge magnitudes") {
    for (s <- Seq(0, 6)) {
      assert(FastRound.round(Double.NaN, s).isNaN)
      assert(FastRound.round(Double.PositiveInfinity, s).isPosInfinity)
      assert(FastRound.round(Double.NegativeInfinity, s).isNegInfinity)
      Seq(0.0, -0.0, 1e18, -1e18, 1e300, -1e300, Double.MinPositiveValue,
        -Double.MinPositiveValue, 4.9e-7, -4.9e-7, 5.1e-7, -5.1e-7)
        .foreach { x =>
          assert(java.lang.Double.doubleToLongBits(FastRound.round(x, s)) ==
            java.lang.Double.doubleToLongBits(sparkRound(x, s)), s"x=$x s=$s")
        }
    }
  }

  test("column form agrees with functions.round in a real plan (codegen path)") {
    VectorFunctions.register(spark)
    val df = spark.range(100000).select(
      (rand(7) * 2 - 1).as("x"))
    val cmp = df.select(
        FastRound.round6(col("x")).as("fast"),
        round(col("x"), 6).as("ref"))
      .filter(col("fast") =!= col("ref") ||
        col("fast").isNull =!= col("ref").isNull)
    assert(cmp.count() == 0)
  }

  test("null passthrough") {
    VectorFunctions.register(spark)
    val r = Seq[Option[Double]](Some(0.1234565), None).toDF("x")
      .select(FastRound.round6(col("x"))).collect()
    assert(r(0).getDouble(0) == 0.123457 || r(0).getDouble(0) == 0.123456)
    assert(r(1).isNullAt(0))
  }
}
