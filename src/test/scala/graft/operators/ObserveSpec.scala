package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ObserveSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq(
    (1L, "en", 50L), (2L, "en", 500L), (3L, "de", 20L), (4L, "de", 300L),
    (5L, "fr", 1000L)
  ).toDF("id", "lang", "n")

  test("observed metrics equal a separate aggregation pass") {
    val (observed, obs) = Observe.profiled(rows,
      "rows" -> count(lit(1)),
      "short" -> count(when($"n" < 100, 1)),
      "sum_n" -> sum($"n"))
    observed.collect()
    val m = obs.get
    assert(m("rows") == 5L && m("short") == 2L && m("sum_n") == 1870L)
  }

  test("pushdown barrier: a downstream filter does not shrink the metrics") {
    val (observed, obs) = Observe.profiled(rows, "rows" -> count(lit(1)))
    val kept = observed.filter($"n" >= 100).count()
    assert(kept == 3L)
    assert(obs.get("rows") == 5L) // full scan observed, 40% kept
  }

  test("metrics ride a grouped-aggregate consumer too") {
    val (observed, obs) = Observe.profiled(rows,
      "null_langs" -> count(when($"lang".isNull, 1)))
    val agg = observed.groupBy($"lang").agg(sum($"n").as("s")).collect()
    assert(agg.length == 3)
    assert(obs.get("null_langs") == 0L)
  }

  test("no metrics fails loudly") {
    intercept[IllegalArgumentException] { Observe.profiled(rows) }
  }
}
