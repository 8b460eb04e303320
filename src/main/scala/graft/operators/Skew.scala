package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives. AQE's runtime skew-join splitting
  * (spark.sql.adaptive.skewJoin) is the first line of defense; salting
  * is the explicit fallback when a handful of hot keys dwarf everything
  * (classic power-law join keys in web/event data) or when AQE can't
  * see the skew (e.g. post-shuffle-free narrow plans).
  *
  * Salted join: the fact side gets a deterministic salt in [0, n) per
  * row; the dim side is replicated n× (one row per salt); the join key
  * becomes (key, salt), spreading each hot key over n reducers. Result
  * set is EXACTLY the plain join's — verified by the oracle of the
  * query that exercises this path.
  */
object Skew {

  /** Inner equi-join of `facts` to `dims` on `key`, salted `n` ways.
    * Dim replication costs n× the (small) dim size — use for
    * medium dims too big to broadcast but small enough to replicate;
    * for broadcast-able dims just use broadcast(). */
  def saltedJoin(
      facts: DataFrame, dims: DataFrame, key: String,
      n: Int = 8, joinType: String = "inner"): DataFrame = {
    require(n > 0)
    // deterministic per-row salt: stable under retries (a random salt
    // breaks speculative-execution / task-retry exactly-once shuffles)
    val salted = facts.withColumn("__salt",
      pmod(xxhash64(struct(facts.columns.toIndexedSeq.map(col): _*)), lit(n)).cast("int"))
    val replicated = dims.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** [[saltedJoin]] with the n× dim-replication cost paid ONLY for hot
    * keys: a first aggregation finds keys with more than `hotThreshold`
    * fact rows (at 100 TB this is a cheap map-side-combined count of
    * DISTINCT-key cardinality, not of the fact table), those keys get
    * salted n ways, everything else joins unsalted. Cold dim rows are
    * never replicated, so total dim inflation is n × |hot keys| instead
    * of n × |dim| — the difference between "works for 8 hot keys out of
    * a billion" and "8× the dim shuffle".
    *
    * The hot-key frame is broadcast (a handful of keys by construction:
    * keys exceeding a row-count threshold are few, or the threshold is
    * mis-set), so tagging adds no shuffle to either side. */
  def adaptiveSaltedJoin(
      facts: DataFrame, dims: DataFrame, key: String,
      n: Int = 8, hotThreshold: Long = 100000L): DataFrame = {
    require(n > 0)
    val hot = broadcast(
      facts.groupBy(col(key)).agg(count(lit(1)).as("__freq"))
        .filter(col("__freq") > hotThreshold)
        .select(col(key), lit(true).as("__hot")))
    val taggedFacts = facts.join(hot, Seq(key), "left").withColumn("__salt",
      when(col("__hot").isNotNull,
        pmod(xxhash64(struct(facts.columns.toIndexedSeq.map(col): _*)), lit(n)))
        .otherwise(lit(0)).cast("int"))
      .drop("__hot")
    val taggedDims = dims.join(hot, Seq(key), "left").withColumn("__salt",
      explode(when(col("__hot").isNotNull, sequence(lit(0), lit(n - 1)))
        .otherwise(array(lit(0)))))
      .drop("__hot")
    taggedFacts.join(taggedDims, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
