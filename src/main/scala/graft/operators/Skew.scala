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
}
