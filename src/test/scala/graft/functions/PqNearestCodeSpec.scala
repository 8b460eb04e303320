package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** [[graft.functions.PqNearestCode]] contracts: bit-parity with the literal
  * `array_position(scoreArray, array_min(scoreArray)) - 1` form it
  * replaced (same left-fold dot, same norm − 2·dot score, same
  * first-minimum tie-break), and survival at the production codebook
  * width (k=256) where the literal form blew janino's 64 KB limit and
  * silently fell back to interpreted execution. */
class PqNearestCodeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, dim: Int) = {
    VectorFunctions.register(spark)
    spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => sin(col("id") * lit(37) + j * lit(13))).as("v"))
  }

  test("≡ the scoreArray argmin form, element for element") {
    val df = corpus(500, 8).repartition(7)
    for (k <- Seq(3, 16)) {
      val books = ProductQuant.trainCodebooks(
        df.select(col("id"), col("v")), "id", "v", m = 1, k = k)
      val got = df.select(col("id"),
          ProductQuant.nearestCode(col("v"), books.head).as("c"))
        .as[(Long, Int)].collect().toMap
      val legacy = df
        .withColumn("__sc", ProductQuant.scoreArray(
          col("v"), books.head))
        .select(col("id"),
          (array_position(col("__sc"), array_min(col("__sc"))) - 1)
            .cast("int").as("c"))
        .as[(Long, Int)].collect().toMap
      assert(got == legacy, s"k=$k")
    }
  }

  test("exact ties resolve to the FIRST codeword, like array_position") {
    // duplicate codewords: every vector scores them identically, so
    // the returned code must be the lower index
    val cw = Array(1.0, 2.0, 3.0, 4.0)
    val books = Seq(Seq(cw, cw.clone(), Array(9.0, 9.0, 9.0, 9.0)))
    val df = corpus(50, 4)
    val codes = df.select(
        ProductQuant.nearestCode(col("v"), books.head).as("c"))
      .as[Int].collect()
    assert(!codes.contains(1), "tie must resolve to index 0, never 1")
  }

  test("k=256 codebook stays inside whole-stage codegen") {
    val df = corpus(400, 16)
    val books = ProductQuant.trainCodebooks(df, "id", "v", m = 2, k = 256)
    val sub = 8
    val coded = df
      .select(col("id"), slice(col("v"), 1, sub).as("s0"),
        slice(col("v"), sub + 1, sub).as("s1"))
      .select(col("id"),
        ProductQuant.nearestCode(col("s0"), books.head).as("c0"),
        ProductQuant.nearestCode(col("s1"), books(1)).as("c1"))
    // the generated code for the projection must COMPILE: a janino
    // 64 KB failure would silently fall back to interpreted execution
    // (the failure mode the literal scoreArray form had at this k), so
    // compile every whole-stage span of the plan explicitly
    val spans = coded.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty,
      coded.queryExecution.executedPlan.toString().take(400))
    spans.foreach { w =>
      val (_, source) = w.doCodeGen()
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .compile(source) // throws on janino overflow
    }
    // and produce in-range codes over every row
    val rows = coded.as[(Long, Int, Int)].collect()
    assert(rows.length == 400)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 256 &&
      r._3 >= 0 && r._3 < 256))
    // cross-check a sample against the interpreted eval path
    val sample = df.filter(col("id") < 20)
      .select(col("id"), slice(col("v"), 1, sub).as("s0"))
    val gen = sample
      .select(col("id"), ProductQuant.nearestCode(col("s0"), books.head))
      .as[(Long, Int)].collect().toMap
    val interp = sample.as[(Long, Seq[Double])].collect().map {
      case (id, sv) =>
        val scored = books.head.map { cw =>
          var n2 = 0.0; var d = 0.0; var j = 0
          while (j < sub) { n2 += cw(j) * cw(j); d += sv(j) * cw(j); j += 1 }
          n2 - 2.0 * d
        }
        id -> scored.indexOf(scored.min)
    }.toMap
    assert(gen == interp)
  }
}
