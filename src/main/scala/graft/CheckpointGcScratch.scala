package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: does a dropped localCheckpoint frame leave
  * getPersistentRDDs within a GC+ContextCleaner window? */
object CheckpointGcScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    def poll(label: String, before: scala.collection.Set[Int]): Unit = {
      var i = 0
      var leaked = sc.getPersistentRDDs.keySet -- before
      while (leaked.nonEmpty && i < 40) {
        System.gc()
        Thread.sleep(250)
        leaked = sc.getPersistentRDDs.keySet -- before
        i += 1
      }
      println(s"PROBE $label: leaked=$leaked after $i gc rounds")
    }

    // case 0: core-RDD persist, ref dropped (no SQL layer)
    val b0 = sc.getPersistentRDDs.keySet
    locally {
      val rdd = sc.parallelize(0 until 100000, 4).map(_ * 2)
      rdd.persist().count()
    }
    poll("case0 core rdd persist", b0)

    // case 0b: core-RDD localCheckpoint, ref dropped (no SQL layer)
    val b0b = sc.getPersistentRDDs.keySet
    locally {
      val rdd = sc.parallelize(0 until 100000, 4).map(_ * 2)
      rdd.localCheckpoint()
      rdd.count()
    }
    poll("case0b core rdd localCheckpoint", b0b)

    // case 1: plain localCheckpoint, ref dropped
    val b1 = sc.getPersistentRDDs.keySet
    val weakRef = locally {
      val df = spark.range(0, 100000).select(col("id"), (col("id") * 2).as("x"))
        .localCheckpoint(true)
      df.count()
      val id = (sc.getPersistentRDDs.keySet -- b1).head
      new java.lang.ref.WeakReference(sc.getPersistentRDDs(id))
    }
    poll("case1 simple", b1)
    println(s"PROBE case1 rdd object collected: ${weakRef.get() == null}")

    // case 2: checkpoint built over a persisted+unpersisted intermediate
    val b2 = sc.getPersistentRDDs.keySet
    locally {
      val mid = spark.range(0, 100000).select(col("id"), (col("id") % 7).as("k"))
        .persist()
      val out = mid.groupBy(col("k")).agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      mid.unpersist(false)
      out.count()
    }
    poll("case2 persisted-mid", b2)

    // case 3: join-shaped (self-join like the pair generators)
    val b3 = sc.getPersistentRDDs.keySet
    locally {
      val sh = spark.range(0, 50000)
        .select((col("id") % 1000).as("key"), col("id").as("doc"))
        .persist()
      val out = sh.alias("a").join(sh.alias("b"), "key")
        .groupBy(col("a.doc")).agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      sh.unpersist(false)
      out.count()
    }
    poll("case3 self-join", b3)

    spark.stop()
  }
}
