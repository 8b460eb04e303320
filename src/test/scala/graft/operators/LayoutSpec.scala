package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton interleave exactness, the quadtree-block span guarantee, and
  * the ranged writer's per-file rectangle compactness. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("morton2 interleaves bits exactly") {
    val cases = Seq( // (x, y, expected z)
      (1L, 0L, 1L), (0L, 1L, 2L), (3L, 3L, 15L), (2L, 1L, 6L),
      (5L, 2L, 25L), // x=101 -> z bits {0,4} = 17, y=010 -> z bit 3 = 8
      (511L, 511L, (1L << 18) - 1))
    val got = cases.map(c => (c._1, c._2)).toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.morton2(col("x"), col("y"), 9).as("z"))
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    cases.foreach { case (x, y, z) => assert(got((x, y)) === z, s"($x,$y)") }
  }

  test("quadtree blocks bound both key spans (the pruning guarantee)") {
    val rnd = new scala.util.Random(31)
    val pts = Seq.fill(20000)((rnd.nextInt(512).toLong, rnd.nextInt(512).toLong))
      .toDF("x", "y")
    val spans = pts
      .withColumn("blk", shiftright(Layout.morton2(col("x"), col("y"), 9), 13))
      .groupBy("blk")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    assert(spans.length === 32) // dense data fills all 32 blocks
    spans.foreach { case (blk, xs, ys, _) =>
      assert(xs <= 127 && ys <= 63, s"block $blk spans ($xs, $ys)")
    }
  }

  test("zOrderWrite: file statistics prune on BOTH dims; 1-D sort on one") {
    val rnd = new scala.util.Random(47)
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val xDir = java.nio.file.Files.createTempDirectory("xorder").toString
    val pts = Seq.fill(30000)((rnd.nextInt(512).toLong, rnd.nextInt(512).toLong))
      .toDF("x", "y")
    Layout.zOrderWrite(pts, col("x"), col("y"), bits = 9,
      nFiles = 16, path = zDir)
    // baseline: the same data range-clustered by x alone
    pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xDir)
    def fileStats(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("y").as("y_min"), max("y").as("y_max"))
      .as[(String, Long, Long)].collect()
    val zStats = fileStats(zDir)
    val xStats = fileStats(xDir)
    assert(zStats.length >= 8 && xStats.length >= 8)
    // a y ∈ [0, 63] predicate against each layout's file min/max stats:
    def surviving(st: Array[(String, Long, Long)]) =
      st.count { case (_, lo, hi) => lo <= 63 && hi >= 0 }
    // x-sorted layout prunes nothing on y (every file spans all of y)…
    assert(surviving(xStats) === xStats.length)
    // …the z layout prunes at least half its files on the same predicate
    assert(surviving(zStats) * 2 <= zStats.length,
      s"z layout: ${surviving(zStats)} of ${zStats.length} files survive")
  }
}
