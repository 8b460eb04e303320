package graft.queries

import graft.Tables
import graft.operators.{DataMix, Diff, Ivm, Upsert}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE / CDC-apply coverage: a deterministic change feed — derived
  * from `orders` via the portable id-hash bucket, so DuckDB can
  * reproduce it — applied to the orders table with
  * [[graft.operators.Upsert.applyChanges]]: 10% deletes, 10% status
  * updates, 10% new-key inserts. The oracle rebuilds the merged state
  * relationally, checking delete/update/insert semantics end-to-end.
  */
object UpsertQueries {

  private val Seed = 7L

  def mergeOrders(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val bkt = DataMix.hashBucket(col("o_orderkey"), Seed)
    val deletes = base.filter(bkt < 100000)
      .select(lit("delete").as("op"), col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
    val updates = base.filter(bkt >= 100000 && bkt < 200000)
      .select(lit("update").as("op"), col("o_orderkey"),
        lit("U").as("o_orderstatus"), col("o_totalprice"))
    val inserts = base.filter(bkt >= 200000 && bkt < 300000)
      .select(lit("insert").as("op"),
        (col("o_orderkey") + 1000000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("o_totalprice"))
    val changes = deletes.unionByName(updates).unionByName(inserts)
    Upsert.applyChanges(base, changes, "o_orderkey")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("price_cents"))
  }

  val mergeOrdersSql: String =
    s"""WITH b AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice,
       |    ('0x'||substr(md5(o_orderkey::VARCHAR || '#$Seed'),1,15))::BIGINT
       |      % 1000000 AS bkt
       |  FROM orders),
       |merged AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice
       |  FROM b WHERE bkt >= 200000
       |  UNION ALL
       |  SELECT o_orderkey, 'U', o_totalprice
       |  FROM b WHERE bkt >= 100000 AND bkt < 200000
       |  UNION ALL
       |  SELECT o_orderkey + 1000000000, 'N', o_totalprice
       |  FROM b WHERE bkt >= 200000 AND bkt < 300000)
       |SELECT o_orderstatus, count(*) AS n_orders,
       |  (sum(${sqlCents("o_totalprice")}))::BIGINT AS price_cents
       |FROM merged GROUP BY 1""".stripMargin

  /** Incremental view maintenance: q63's per-status aggregate, but
    * maintained by folding ONLY the change feed into the pre-built
    * aggregate ([[graft.operators.Ivm]]) — the base table is scanned
    * once to build the starting aggregate and once (keys-joined) to
    * recover old images; never rescanned for the refresh. The oracle
    * is deliberately q63's full-recompute SQL: incremental ≡ recompute
    * is the IVM contract, checked to the last cent. */
  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("price_cents"))
    val bkt = DataMix.hashBucket(col("o_orderkey"), Seed)
    val deletes = base.filter(bkt < 100000)
      .select(lit("delete").as("op"), col("o_orderkey"),
        col("o_orderstatus"), col("price_cents"))
    val updates = base.filter(bkt >= 100000 && bkt < 200000)
      .select(lit("update").as("op"), col("o_orderkey"),
        lit("U").as("o_orderstatus"), col("price_cents"))
    val inserts = base.filter(bkt >= 200000 && bkt < 300000)
      .select(lit("insert").as("op"),
        (col("o_orderkey") + 1000000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("price_cents"))
    val changes = deletes.unionByName(updates).unionByName(inserts)
    val agg0 = base.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_cents")).as("price_cents"))
    Ivm.maintainSumCountAgg(agg0, base, changes, "o_orderkey", "op",
      "o_orderstatus", "n_orders", Seq("price_cents"))
  }

  /** Snapshot diff between two generations of the orders table — the
    * "new" generation is derived deterministically from the old one
    * (every 97th key removed, every 89th surviving key's price bumped
    * by exactly 1.0 — IEEE-exact on 2-decimal money — every 101st key
    * re-inserted negated as an add), so DuckDB rebuilds the identical
    * pair of snapshots and replays the classification. The result is
    * [[graft.operators.Diff.diffSummary]]: per-status counts + exact
    * key checksums. */
  def snapshotDiffOrders(s: SparkSession, d: String): DataFrame = {
    val old = Tables.orders(s, d)
    val newDf = old.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 89 === 0, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")))
      .unionByName(old.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", -col("o_orderkey")))
    Diff.diffSummary(old, newDf, "o_orderkey")
  }

  val snapshotDiffOrdersSql: String =
    """WITH n AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 101 = 0),
      |d AS (
      |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
      |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
      |         WHEN n.o_orderkey IS NULL THEN 'removed'
      |         WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
      |           OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
      |           OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
      |           OR o.o_orderdate IS DISTINCT FROM n.o_orderdate
      |           OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
      |         THEN 'changed' ELSE 'unchanged' END AS status
      |  FROM orders o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
      |SELECT status, count(*) AS n, (sum(k))::BIGINT AS key_sum
      |FROM d GROUP BY 1""".stripMargin

  /** CDC time travel: orders published into an on-disk
    * [[graft.streaming.BucketedCdcTable]], two deterministic change
    * batches folded in (batch 1 = q63's feed; batch 2 deletes/updates
    * a disjoint key region), then ALL THREE generations read back via
    * their manifests and summarized — each batch rewrote only the
    * key-buckets it touched, and the manifest-per-generation protocol
    * keeps every past state a plain partition-pruned parquet read.
    * The oracle rebuilds gen0/gen1/gen2 relationally (unrolled apply
    * CTEs) and must match per-generation to the cent. */
  def cdcTimeTravel(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("price_cents"))
    val bkt = DataMix.hashBucket(col("o_orderkey"), Seed)
    def op(name: String) = lit(name).as("op")
    val feed1 = base.filter(bkt < 100000)
      .select(op("delete"), col("o_orderkey"), col("o_orderstatus"),
        col("price_cents"))
      .unionByName(base.filter(bkt >= 100000 && bkt < 200000)
        .select(op("update"), col("o_orderkey"),
          lit("U").as("o_orderstatus"), col("price_cents")))
      .unionByName(base.filter(bkt >= 200000 && bkt < 300000)
        .select(op("insert"), (col("o_orderkey") + 1000000000L)
          .as("o_orderkey"), lit("N").as("o_orderstatus"),
          col("price_cents")))
    val feed2 = base.filter(bkt >= 300000 && bkt < 350000)
      .select(op("delete"), col("o_orderkey"), col("o_orderstatus"),
        col("price_cents"))
      .unionByName(base.filter(bkt >= 350000 && bkt < 400000)
        .select(op("update"), col("o_orderkey"),
          lit("V").as("o_orderstatus"), col("price_cents")))
    val dir = tempWorkDir("graft_q114_")
    // the scale variant: batches 1 and 2 rewrite only the key-buckets
    // they touch; time travel reads each generation's manifest.
    // nBuckets sized for the BENCH corpus (8 at sf0.1 keeps per-bucket
    // files non-trivial; production sizes buckets to ~256 MB — r8
    // NOTES/cdcscale): the bucketed machinery's cost at toy scale is
    // file count, and 32 buckets cost 6.8s vs the flat table's 2.9s
    // for zero extra coverage
    val cdc = new graft.streaming.BucketedCdcTable(
      s, dir, "o_orderkey", nBuckets = 8)
    cdc.publish(base)
    cdc.applyBatch(feed1)
    cdc.applyBatch(feed2)
    (0 to 2).map(g => cdc.snapshotAt(g).withColumn("gen", lit(g.toLong)))
      .reduce(_ unionByName _)
      .groupBy(col("gen"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("price_cents")).as("price_cents"))
  }

  val cdcTimeTravelSql: String =
    s"""WITH b AS (
       |  SELECT o_orderkey, o_orderstatus, ${sqlCents("o_totalprice")}
       |      AS price_cents,
       |    ('0x'||substr(md5(o_orderkey::VARCHAR || '#$Seed'),1,15))::BIGINT
       |      % 1000000 AS bkt
       |  FROM orders),
       |g0 AS (SELECT o_orderkey, o_orderstatus, price_cents FROM b),
       |g1 AS (
       |  SELECT o_orderkey, o_orderstatus, price_cents FROM b
       |  WHERE bkt >= 200000
       |  UNION ALL
       |  SELECT o_orderkey, 'U', price_cents FROM b
       |  WHERE bkt >= 100000 AND bkt < 200000
       |  UNION ALL
       |  SELECT o_orderkey + 1000000000, 'N', price_cents FROM b
       |  WHERE bkt >= 200000 AND bkt < 300000),
       |g2 AS (
       |  SELECT g1.* FROM g1
       |  LEFT JOIN (SELECT o_orderkey FROM b
       |             WHERE bkt >= 300000 AND bkt < 400000) t2
       |    ON g1.o_orderkey = t2.o_orderkey
       |  WHERE t2.o_orderkey IS NULL
       |  UNION ALL
       |  SELECT o_orderkey, 'V', price_cents FROM b
       |  WHERE bkt >= 350000 AND bkt < 400000)
       |SELECT gen, o_orderstatus, count(*) AS n_orders,
       |  (sum(price_cents))::BIGINT AS price_cents
       |FROM (
       |  SELECT CAST(0 AS BIGINT) AS gen, * FROM g0
       |  UNION ALL SELECT CAST(1 AS BIGINT), * FROM g1
       |  UNION ALL SELECT CAST(2 AS BIGINT), * FROM g2)
       |GROUP BY 1, 2""".stripMargin

  /** q111's maintained aggregate through the PERSISTED bucketed pair
    * ([[graft.streaming.BucketedCdcAggTable]]): the same change feed
    * folds in as two on-disk CDC batches — each rewrites only its
    * touched key-buckets AND reads old images from only those buckets
    * (the partition-pruned manifest view), with a commit record per
    * batch. The oracle stays q63's full-recompute SQL: incremental ≡
    * recompute, now with the scale-path storage underneath. */
  def bucketedCdcAgg(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("price_cents"))
    val bkt = DataMix.hashBucket(col("o_orderkey"), Seed)
    val deletes = base.filter(bkt < 100000)
      .select(lit("delete").as("op"), col("o_orderkey"),
        col("o_orderstatus"), col("price_cents"))
    val updates = base.filter(bkt >= 100000 && bkt < 200000)
      .select(lit("update").as("op"), col("o_orderkey"),
        lit("U").as("o_orderstatus"), col("price_cents"))
    val inserts = base.filter(bkt >= 200000 && bkt < 300000)
      .select(lit("insert").as("op"),
        (col("o_orderkey") + 1000000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("price_cents"))
    val changes = deletes.unionByName(updates).unionByName(inserts)
    val dir = tempWorkDir("graft_q134_")
    val t = new graft.streaming.BucketedCdcAggTable(s, dir,
      "o_orderkey", "o_orderstatus", "n_orders", Seq("price_cents"),
      nBuckets = 8)
    t.publish(base)
    // one on-disk batch here (the gate needs the storage path, not a
    // timeline — multi-batch sequences + recovery are spec-pinned in
    // BucketedCdcTableSpec; a second batch only re-buys fixed job
    // overhead in the bench)
    t.applyBatch(changes, 0L)
    t.aggSnapshot
  }

  /** Stats-pruned scan over the bucketed CDC table
    * ([[graft.streaming.BucketedCdcTable.scanWhere]]): orders publish
    * range-clustered on price (so each data file's per-file min/max
    * manifest stats cover a narrow price slice), one change batch
    * folds in (its rewritten buckets get fresh — wide — stats), and a
    * price-range read then skips every file whose `[min, max]` misses
    * the range, on top of the manifest's bucket/generation pruning.
    * The oracle is the post-batch state filtered to the same range —
    * equivalence of the skipping scan with the plain filtered
    * snapshot; the measured skip fraction is pinned in
    * BucketedCdcTableSpec. */
  def statsPrunedScan(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("price_cents"))
    val bkt = DataMix.hashBucket(col("o_orderkey"), Seed)
    val changes = base.filter(bkt < 100000)
      .select(lit("delete").as("op"), col("o_orderkey"),
        col("o_orderstatus"), col("price_cents"))
      .unionByName(base.filter(bkt >= 100000 && bkt < 200000)
        .select(lit("update").as("op"), col("o_orderkey"),
          lit("U").as("o_orderstatus"), col("price_cents")))
    val dir = tempWorkDir("graft_q143_")
    val t = new graft.streaming.BucketedCdcTable(
      s, dir, "o_orderkey", nBuckets = 8,
      statsCols = Seq("price_cents"))
    t.publish(base.repartitionByRange(8, col("price_cents")))
    t.applyBatch(changes)
    t.scanWhere("price_cents", 5000000L, 10000000L)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("price_cents")).as("price_cents"))
  }

  val statsPrunedScanSql: String =
    s"""WITH b AS (
       |  SELECT o_orderkey, o_orderstatus, ${sqlCents("o_totalprice")}
       |      AS price_cents,
       |    ('0x'||substr(md5(o_orderkey::VARCHAR || '#$Seed'),1,15))::BIGINT
       |      % 1000000 AS bkt
       |  FROM orders),
       |g1 AS (
       |  SELECT o_orderkey, o_orderstatus, price_cents FROM b
       |  WHERE bkt >= 200000
       |  UNION ALL
       |  SELECT o_orderkey, 'U', price_cents FROM b
       |  WHERE bkt >= 100000 AND bkt < 200000)
       |SELECT o_orderstatus, count(*) AS n_orders,
       |  (sum(price_cents))::BIGINT AS price_cents
       |FROM g1
       |WHERE price_cents BETWEEN 5000000 AND 10000000
       |GROUP BY 1""".stripMargin

  /** q203: q143's stats-pruned scan on a RAW DOUBLE stats column — no
    * cents lifting anywhere. Per-file min/max stats are stored through
    * the order-preserving IEEE-754 bit lift
    * ([[graft.functions.IeeeSortable.liftSigned]]), so file skipping on
    * a float metric is exactly as tight as on integers; the scan's
    * bounds lift through the same map and the ORIGINAL double
    * predicate is still applied to the kept files
    * (`scanWhereDouble ≡ snapshot.filter` by construction — pinned with
    * negatives and NaNs in BucketedCdcTableSpec). Selection-free
    * aggregate output keeps the money exact via cents at the END. */
  def statsPrunedDoubleScan(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val bkt = DataMix.hashBucket(col("o_orderkey"), Seed)
    val changes = base.filter(bkt < 100000)
      .select(lit("delete").as("op"), col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
      .unionByName(base.filter(bkt >= 100000 && bkt < 200000)
        .select(lit("update").as("op"), col("o_orderkey"),
          lit("U").as("o_orderstatus"), col("o_totalprice")))
    val dir = tempWorkDir("graft_q203_")
    val t = new graft.streaming.BucketedCdcTable(
      s, dir, "o_orderkey", nBuckets = 8,
      statsCols = Seq("o_totalprice"))
    t.publish(base.repartitionByRange(8, col("o_totalprice")))
    t.applyBatch(changes)
    t.scanWhereDouble("o_totalprice", 50000.25, 100000.75)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("price_cents"))
  }

  val statsPrunedDoubleScanSql: String =
    s"""WITH b AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice,
       |    ('0x'||substr(md5(o_orderkey::VARCHAR || '#$Seed'),1,15))::BIGINT
       |      % 1000000 AS bkt
       |  FROM orders),
       |g1 AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM b
       |  WHERE bkt >= 200000
       |  UNION ALL
       |  SELECT o_orderkey, 'U', o_totalprice FROM b
       |  WHERE bkt >= 100000 AND bkt < 200000)
       |SELECT o_orderstatus, count(*) AS n_orders,
       |  (sum(${sqlCents("o_totalprice")}))::BIGINT AS price_cents
       |FROM g1
       |WHERE o_totalprice BETWEEN 50000.25 AND 100000.75
       |GROUP BY 1""".stripMargin

  /** q194: SCHEMA EVOLUTION on the bucketed CDC table, gated across a
    * time-travel boundary. Generation 0 publishes `price_cents` as INT
    * with no `src` column; the table then records two evolution ops
    * (int→long widening, add-with-default) WITHOUT rewriting a byte of
    * data, and generation 1 folds a batch whose updates need the long
    * range and whose rows carry the new column. The result unions both
    * snapshots: the pre-evolution generation must answer under the
    * MERGED schema (old rows padded with the recorded default, values
    * cast up), which the oracle replays as per-generation SQL with the
    * old schema explicitly padded. Aggregating sums past int range
    * proves the widening is live, not cosmetic. */
  def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"),
        cents(col("o_totalprice")).cast("int").as("price_cents"))
    val bkt = DataMix.hashBucket(col("o_orderkey"), Seed)
    val dir = tempWorkDir("graft_q194_")
    val cdc = new graft.streaming.BucketedCdcTable(
      s, dir, "o_orderkey", nBuckets = 8)
    cdc.publish(base)
    cdc.evolveWiden("price_cents")
    cdc.evolveAddColumn("src", "string", "legacy")
    val feed = base.filter(bkt < 150000)
      .select(lit("update").as("op"), col("o_orderkey"),
        (col("price_cents").cast("long") + 4000000000L).as("price_cents"),
        lit("feed").as("src"))
      .unionByName(base.filter(bkt >= 900000 && bkt < 950000)
        .select(lit("insert").as("op"),
          (col("o_orderkey") + 2000000000L).as("o_orderkey"),
          col("price_cents").cast("long").as("price_cents"),
          lit("feed").as("src")))
    cdc.applyBatch(feed)
    (0 to 1).map(g => cdc.snapshotAt(g).withColumn("gen", lit(g.toLong)))
      .reduce(_ unionByName _)
      .groupBy(col("gen"), col("src"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("price_cents")).as("price_cents"))
  }

  val schemaEvolutionSql: String =
    s"""WITH b AS (
       |  SELECT o_orderkey, ${sqlCents("o_totalprice")} AS price_cents,
       |    ('0x'||substr(md5(o_orderkey::VARCHAR || '#$Seed'),1,15))::BIGINT
       |      % 1000000 AS bkt
       |  FROM orders),
       |g0 AS (
       |  SELECT o_orderkey, price_cents, 'legacy' AS src FROM b),
       |g1 AS (
       |  SELECT o_orderkey, price_cents, 'legacy' AS src FROM b
       |  WHERE bkt >= 150000
       |  UNION ALL
       |  SELECT o_orderkey, price_cents + 4000000000, 'feed' FROM b
       |  WHERE bkt < 150000
       |  UNION ALL
       |  SELECT o_orderkey + 2000000000, price_cents, 'feed' FROM b
       |  WHERE bkt >= 900000 AND bkt < 950000)
       |SELECT gen, src, count(*) AS n_rows,
       |  (sum(price_cents))::BIGINT AS price_cents
       |FROM (
       |  SELECT CAST(0 AS BIGINT) AS gen, * FROM g0
       |  UNION ALL SELECT CAST(1 AS BIGINT), * FROM g1)
       |GROUP BY 1, 2""".stripMargin

  /** q197: VACUUM + time travel within the retention horizon. q114's
    * exact on-disk timeline (gens 0/1/2 on the bucketed table), then
    * two `vacuum(retainLast = 2)` passes — the first MARKS generation
    * 0 expired (floor rises to 1, reads below it refuse), the second
    * SWEEPS its manifest and every data generation no retained
    * manifest references (one janitor cycle of reader grace). The
    * result unions the two SURVIVING generations, which must still be
    * byte-exact against the relational replay: retention must reclaim
    * gen 0's storage without perturbing a single retained row. The
    * refusal/deletion mechanics are spec-pinned in RetentionSpec; this
    * gate pins post-vacuum READ correctness under the oracle. */
  def vacuumTimeTravel(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("price_cents"))
    val bkt = DataMix.hashBucket(col("o_orderkey"), Seed)
    def op(name: String) = lit(name).as("op")
    val feed1 = base.filter(bkt < 100000)
      .select(op("delete"), col("o_orderkey"), col("o_orderstatus"),
        col("price_cents"))
      .unionByName(base.filter(bkt >= 100000 && bkt < 200000)
        .select(op("update"), col("o_orderkey"),
          lit("U").as("o_orderstatus"), col("price_cents")))
      .unionByName(base.filter(bkt >= 200000 && bkt < 300000)
        .select(op("insert"), (col("o_orderkey") + 1000000000L)
          .as("o_orderkey"), lit("N").as("o_orderstatus"),
          col("price_cents")))
    val feed2 = base.filter(bkt >= 300000 && bkt < 350000)
      .select(op("delete"), col("o_orderkey"), col("o_orderstatus"),
        col("price_cents"))
      .unionByName(base.filter(bkt >= 350000 && bkt < 400000)
        .select(op("update"), col("o_orderkey"),
          lit("V").as("o_orderstatus"), col("price_cents")))
    val dir = tempWorkDir("graft_q197_")
    val cdc = new graft.streaming.BucketedCdcTable(
      s, dir, "o_orderkey", nBuckets = 8)
    cdc.publish(base)
    cdc.applyBatch(feed1)
    cdc.applyBatch(feed2)
    cdc.vacuum(retainLast = 2) // mark: floor -> 1
    cdc.vacuum(retainLast = 2) // sweep: gen 0's bytes reclaimed
    (1 to 2).map(g => cdc.snapshotAt(g).withColumn("gen", lit(g.toLong)))
      .reduce(_ unionByName _)
      .groupBy(col("gen"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("price_cents")).as("price_cents"))
  }

  val vacuumTimeTravelSql: String =
    s"""WITH b AS (
       |  SELECT o_orderkey, o_orderstatus, ${sqlCents("o_totalprice")}
       |      AS price_cents,
       |    ('0x'||substr(md5(o_orderkey::VARCHAR || '#$Seed'),1,15))::BIGINT
       |      % 1000000 AS bkt
       |  FROM orders),
       |g1 AS (
       |  SELECT o_orderkey, o_orderstatus, price_cents FROM b
       |  WHERE bkt >= 200000
       |  UNION ALL
       |  SELECT o_orderkey, 'U', price_cents FROM b
       |  WHERE bkt >= 100000 AND bkt < 200000
       |  UNION ALL
       |  SELECT o_orderkey + 1000000000, 'N', price_cents FROM b
       |  WHERE bkt >= 200000 AND bkt < 300000),
       |g2 AS (
       |  SELECT g1.* FROM g1
       |  LEFT JOIN (SELECT o_orderkey FROM b
       |             WHERE bkt >= 300000 AND bkt < 400000) t2
       |    ON g1.o_orderkey = t2.o_orderkey
       |  WHERE t2.o_orderkey IS NULL
       |  UNION ALL
       |  SELECT o_orderkey, 'V', price_cents FROM b
       |  WHERE bkt >= 350000 AND bkt < 400000)
       |SELECT gen, o_orderstatus, count(*) AS n_orders,
       |  (sum(price_cents))::BIGINT AS price_cents
       |FROM (
       |  SELECT CAST(1 AS BIGINT) AS gen, * FROM g1
       |  UNION ALL SELECT CAST(2 AS BIGINT), * FROM g2)
       |GROUP BY 1, 2""".stripMargin

  /** q199: multi-clause MERGE ([[graft.operators.Upsert.merge]]) —
    * SQL MERGE's full clause surface in one full-outer join + one
    * projected CASE. The source rewrites a deterministic key slice of
    * orders; the clauses exercise every family AND in-family ordering:
    * WHEN MATCHED AND t.status='O' THEN UPDATE, WHEN MATCHED THEN
    * DELETE, WHEN NOT MATCHED AND s.price>5M¢ THEN INSERT, WHEN NOT
    * MATCHED BY SOURCE AND t.price<2M¢ THEN DELETE (prune-stale). The
    * oracle rebuilds the merged state as four relational branches. */
  def multiClauseMerge(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Upsert.MergeClause._
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("price_cents"))
    val bkt = DataMix.hashBucket(col("o_orderkey"), Seed)
    val source = base.filter(bkt < 300000)
      .select(col("o_orderkey"), lit("M").as("o_orderstatus"),
        (col("price_cents") + 1000L).as("price_cents"))
      .unionByName(base.filter(bkt >= 900000 && bkt < 950000)
        .select((col("o_orderkey") + 2000000000L).as("o_orderkey"),
          lit("I").as("o_orderstatus"), col("price_cents")))
    graft.operators.Upsert.merge(base, source, "o_orderkey",
      whenMatched = Seq(
        update("t.o_orderstatus = 'O'"),
        delete()),
      whenNotMatched = Seq(insert("s.price_cents > 5000000")),
      whenNotMatchedBySource = Seq(delete("t.price_cents < 2000000")))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("price_cents")).as("price_cents"))
  }

  val multiClauseMergeSql: String =
    s"""WITH b AS (
       |  SELECT o_orderkey, o_orderstatus, ${sqlCents("o_totalprice")}
       |      AS price_cents,
       |    ('0x'||substr(md5(o_orderkey::VARCHAR || '#$Seed'),1,15))::BIGINT
       |      % 1000000 AS bkt
       |  FROM orders),
       |src AS (
       |  SELECT o_orderkey, 'M' AS o_orderstatus,
       |    price_cents + 1000 AS price_cents
       |  FROM b WHERE bkt < 300000
       |  UNION ALL
       |  SELECT o_orderkey + 2000000000, 'I', price_cents
       |  FROM b WHERE bkt >= 900000 AND bkt < 950000),
       |merged AS (
       |  -- WHEN MATCHED AND t.status='O' THEN UPDATE (else DELETE)
       |  SELECT s.o_orderkey, s.o_orderstatus, s.price_cents
       |  FROM b t JOIN src s ON t.o_orderkey = s.o_orderkey
       |  WHERE t.o_orderstatus = 'O'
       |  UNION ALL
       |  -- WHEN NOT MATCHED AND s.price>5M THEN INSERT
       |  SELECT s.o_orderkey, s.o_orderstatus, s.price_cents
       |  FROM src s LEFT JOIN b t ON t.o_orderkey = s.o_orderkey
       |  WHERE t.o_orderkey IS NULL AND s.price_cents > 5000000
       |  UNION ALL
       |  -- WHEN NOT MATCHED BY SOURCE AND t.price<2M THEN DELETE
       |  -- (i.e. keep the rest)
       |  SELECT t.o_orderkey, t.o_orderstatus, t.price_cents
       |  FROM b t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
       |  WHERE s.o_orderkey IS NULL AND NOT (t.price_cents < 2000000))
       |SELECT o_orderstatus, count(*) AS n_orders,
       |  (sum(price_cents))::BIGINT AS price_cents
       |FROM merged GROUP BY 1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q63_merge_upsert", mergeOrders, Some(mergeOrdersSql)),
    Q("q197_vacuum_time_travel", vacuumTimeTravel, Some(vacuumTimeTravelSql)),
    Q("q199_multi_clause_merge", multiClauseMerge, Some(multiClauseMergeSql)),
    Q("q194_schema_evolution", schemaEvolution, Some(schemaEvolutionSql)),
    Q("q114_cdc_time_travel", cdcTimeTravel, Some(cdcTimeTravelSql)),
    Q("q107_snapshot_diff", snapshotDiffOrders, Some(snapshotDiffOrdersSql)),
    Q("q111_incremental_agg", incrementalAgg, Some(mergeOrdersSql)),
    Q("q134_bucketed_cdc_agg", bucketedCdcAgg, Some(mergeOrdersSql)),
    Q("q143_stats_pruned_scan", statsPrunedScan, Some(statsPrunedScanSql)),
    Q("q203_stats_pruned_double", statsPrunedDoubleScan,
      Some(statsPrunedDoubleScanSql)))
}
