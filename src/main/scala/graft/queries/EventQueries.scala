package graft.queries

import graft.Tables
import graft.operators.{Anomaly, AsOfJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event/time-series coverage over `events` (event_id, ts, user_id,
  * event_type, value, props-json): tumbling-window aggregation,
  * gap-based sessionization, semi-structured JSON extraction, and
  * ROLLUP multi-level totals. Timestamps are compared as epoch
  * microseconds (engine-neutral); money doubles via the cents lift.
  *
  * Scale notes: the tumbling window is a plain keyed aggregation
  * (map-side partial), sessionization is one shuffle on user_id with
  * two window passes over each user's (small) event list, and JSON
  * extraction is scan-side. The same transforms run unchanged under
  * Structured Streaming (window() + watermark); see graft.streaming.
  */
object EventQueries {

  /** Hourly tumbling window per event type: volume, distinct users,
    * exact value total. window() is the streaming-compatible operator;
    * for 1h tumbling it equals date_trunc('hour'). */
  def tumblingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(cents(col("value"))).as("value_cents"))
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("event_type"), col("n_events"), col("n_users"), col("value_cents"))

  val tumblingWindowSql: String =
    s"""SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
       |  count(*) AS n_events,
       |  count(DISTINCT user_id) AS n_users,
       |  (sum(${sqlCents("value")}))::BIGINT AS value_cents
       |FROM events GROUP BY 1, 2""".stripMargin

  /** Gap-based sessionization (30-min inactivity): session boundaries
    * via lag, session index via running sum, then per-session rollup. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
    Tables.events(s, d)
      .withColumn("new_session",
        when(gapUs.isNull || gapUs > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("duration_us"),
        sum(cents(col("value"))).as("value_cents"))
  }

  val sessionizeSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts, value,
       |    (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS UNBOUNDED PRECEDING))::BIGINT AS session_idx
       |  FROM flagged)
       |SELECT user_id, session_idx, count(*) AS n_events,
       |  min(epoch_us(ts)) AS start_us,
       |  max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us,
       |  (sum(${sqlCents("value")}))::BIGINT AS value_cents
       |FROM sess GROUP BY 1, 2""".stripMargin

  /** Semi-structured extraction: JSON path into the props column, then
    * keyed stats over the extracted value. */
  def jsonProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"), sum(col("k")).as("sum_k"),
        countDistinct(col("k")).as("n_distinct_k"))

  val jsonPropsSql: String =
    """SELECT event_type, count(*) AS n,
      |  min(json_extract_string(props, '$.k')::BIGINT) AS min_k,
      |  max(json_extract_string(props, '$.k')::BIGINT) AS max_k,
      |  (sum(json_extract_string(props, '$.k')::BIGINT))::BIGINT AS sum_k,
      |  count(DISTINCT json_extract_string(props, '$.k')::BIGINT) AS n_distinct_k
      |FROM events GROUP BY 1""".stripMargin

  /** ROLLUP totals: (type, day) → (type) → grand total in one pass. */
  def rollupDaily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("value"))
      .rollup(col("event_type"), col("day_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"))

  val rollupDailySql: String =
    s"""SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
       |  count(*) AS n_events,
       |  (sum(${sqlCents("value")}))::BIGINT AS value_cents
       |FROM events
       |GROUP BY ROLLUP (event_type, epoch_us(date_trunc('day', ts)))""".stripMargin

  /** CUBE totals: all four grouping combinations of (type, day) in one
    * pass; null patterns disambiguate the grouping sets (neither
    * grouping column is ever null in the data). */
  def cubeDaily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("value"))
      .cube(col("event_type"), col("day_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"))

  val cubeDailySql: String =
    s"""SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
       |  count(*) AS n_events,
       |  (sum(${sqlCents("value")}))::BIGINT AS value_cents
       |FROM events
       |GROUP BY CUBE (event_type, epoch_us(date_trunc('day', ts)))""".stripMargin

  /** Explicit GROUPING SETS (neither rollup nor cube): per-type totals,
    * per-day totals, and the grand total — skipping the (type, day)
    * detail level — via the SQL surface (the DataFrame API exposes only
    * rollup/cube; arbitrary set lists are a SQL feature in both
    * engines). */
  def groupingSetsDaily(s: SparkSession, d: String): DataFrame = {
    graft.Tables.registerViews(s, d)
    s.sql(
      """SELECT event_type, unix_micros(date_trunc('DAY', ts)) AS day_us,
        |  count(*) AS n_events,
        |  sum(CAST(round(value*100,0) AS BIGINT)) AS value_cents
        |FROM events
        |GROUP BY GROUPING SETS ((event_type),
        |                        (unix_micros(date_trunc('DAY', ts))), ())""".stripMargin)
  }

  val groupingSetsDailySql: String =
    s"""SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
       |  count(*) AS n_events,
       |  (sum(${sqlCents("value")}))::BIGINT AS value_cents
       |FROM events
       |GROUP BY GROUPING SETS ((event_type),
       |                        (epoch_us(date_trunc('day', ts))), ())""".stripMargin

  /** Pivot: per-day event counts spread to one column per type (fixed
    * value list → no extra pass to discover values, stable schema). */
  def pivotDaily(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    Tables.events(s, d)
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("event_type"))
      .groupBy(col("day_us"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("day_us") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
  }

  val pivotDailySql: String =
    """SELECT epoch_us(date_trunc('day', ts)) AS day_us,
      |  count(*) FILTER (event_type = 'click') AS n_click,
      |  count(*) FILTER (event_type = 'view') AS n_view,
      |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
      |  count(*) FILTER (event_type = 'signup') AS n_signup,
      |  count(*) FILTER (event_type = 'error') AS n_error
      |FROM events GROUP BY 1""".stripMargin

  /** As-of join (operators.AsOfJoin): each purchase matched to the
    * user's most recent prior click; DuckDB's native ASOF JOIN is the
    * oracle. */
  def asofPurchaseClick(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_event_id"))
    AsOfJoin.backward(purchases, clicks, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("user_id"),
        col("asof_click_event_id").as("click_event_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
  }

  val asofPurchaseClickSql: String =
    """SELECT p.event_id, p.user_id, c.event_id AS click_event_id,
      |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  /** Native as-of join (plans.AsOfJoinNative → AsOfJoinExec, the custom
    * LogicalPlan/Strategy/SparkPlan extension point): each error event
    * matched to the user's most recent prior purchase. Same oracle
    * family as q33 (DuckDB native ASOF JOIN) but through the
    * single-merge-pass physical operator instead of the composed
    * union+window formulation. */
  def asofNativeErrorPurchase(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_event_id"),
        col("value"))
    graft.plans.AsOfJoinNative.backward(errors, purchases, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("user_id"),
        col("asof_purchase_event_id").as("purchase_event_id"),
        cents(col("asof_value")).as("purchase_cents"),
        (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
  }

  val asofNativeErrorPurchaseSql: String =
    s"""SELECT er.event_id, er.user_id, p.event_id AS purchase_event_id,
      |  ${sqlCents("p.value")} AS purchase_cents,
      |  epoch_us(er.ts) - epoch_us(p.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'error') er
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON er.user_id = p.user_id AND er.ts >= p.ts""".stripMargin

  /** Forward as-of through the same native operator (q179's engine
    * over time-reversed streams): each error event matched to the
    * user's EARLIEST FOLLOWING click — the "what did the user do next"
    * lookup. DuckDB's ASOF supports the `<=` direction natively, so
    * the oracle stays one join. */
  def asofForwardErrorClick(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_event_id"))
    graft.plans.AsOfJoinNative.forward(errors, clicks, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("user_id"),
        col("asof_click_event_id").as("click_event_id"),
        (unix_micros(col("asof_ts")) - unix_micros(col("ts"))).as("gap_us"))
  }

  val asofForwardErrorClickSql: String =
    """SELECT er.event_id, er.user_id, c.event_id AS click_event_id,
      |  epoch_us(c.ts) - epoch_us(er.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'error') er
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON er.user_id = c.user_id AND er.ts <= c.ts""".stripMargin

  /** q200: BROADCAST as-of join ([[graft.plans.BroadcastAsOfJoinExec]])
    * — the dimension-right shape where the merge exec overpays: every
    * event (the 100 TB side) matched to its type's most recent hourly
    * mark, a timeline of ~types×hours rows. `broadcastRight = true`
    * plans the right side through a BroadcastExchange and probes the
    * left IN PLACE — zero Exchange and zero Sort on the event stream
    * (plan-pinned in AsOfJoinNativeSpec). Same DuckDB native-ASOF
    * oracle family as q179. */
  def asofBroadcastDim(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
    val marks = e.groupBy(col("event_type"),
        date_trunc("HOUR", col("ts")).as("mark_ts"))
      .agg(count(lit(1)).as("n_hour"),
        sum(cents(col("value"))).as("cents_hour"))
    graft.plans.AsOfJoinNative.backward(
        e.select(col("event_id"), col("event_type"), col("ts")),
        marks, Seq("event_type"), "ts", "mark_ts",
        broadcastRight = true)
      .select(col("event_id"), col("event_type"),
        (unix_micros(col("ts")) - unix_micros(col("asof_mark_ts")))
          .as("gap_us"),
        col("asof_n_hour").as("n_hour"),
        col("asof_cents_hour").as("cents_hour"))
  }

  val asofBroadcastDimSql: String =
    s"""WITH m AS (
       |  SELECT event_type, date_trunc('hour', ts) AS mark_ts,
       |    count(*) AS n_hour, (sum(${sqlCents("value")}))::BIGINT
       |      AS cents_hour
       |  FROM events GROUP BY 1, 2)
       |SELECT e.event_id, e.event_type,
       |  epoch_us(e.ts) - epoch_us(m.mark_ts) AS gap_us,
       |  m.n_hour, m.cents_hour
       |FROM events e
       |ASOF LEFT JOIN m
       |  ON e.event_type = m.event_type AND e.ts >= m.mark_ts""".stripMargin

  /** q195: NEAREST as-of through the native exec — each error matched
    * to the user's purchase with the smallest |gap| in either
    * direction (two passes of the one-pass merge, never a window; tie
    * = equal gaps takes the backward row — the spec-pinned contract).
    * DuckDB has no nearest ASOF, so the oracle composes its two
    * directional ASOF joins and replays the pick rule verbatim. */
  def asofNearestErrorPurchase(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_event_id"))
    graft.plans.AsOfJoinNative.nearest(errors, purchases,
        Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("user_id"),
        col("asof_purchase_event_id").as("purchase_event_id"),
        abs(unix_micros(col("asof_ts")) - unix_micros(col("ts")))
          .as("gap_us"))
  }

  val asofNearestErrorPurchaseSql: String =
    """WITH er AS (
      |  SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'error'),
      |p AS (
      |  SELECT user_id, ts, event_id AS pid FROM events
      |  WHERE event_type = 'purchase'),
      |b AS (
      |  SELECT er.event_id, er.user_id, er.ts,
      |    p.pid AS b_pid, p.ts AS b_ts
      |  FROM er ASOF LEFT JOIN p
      |    ON er.user_id = p.user_id AND er.ts >= p.ts),
      |f AS (
      |  SELECT er.event_id, p.pid AS f_pid, p.ts AS f_ts
      |  FROM er ASOF LEFT JOIN p
      |    ON er.user_id = p.user_id AND er.ts <= p.ts),
      |j AS (
      |  SELECT b.*, f.f_pid, f.f_ts,
      |    (b_ts IS NOT NULL AND (f_ts IS NULL OR
      |       epoch_us(b.ts) - epoch_us(b_ts) <=
      |       epoch_us(f_ts) - epoch_us(b.ts))) AS choose_b
      |  FROM b JOIN f USING (event_id))
      |SELECT event_id, user_id,
      |  CASE WHEN choose_b THEN b_pid ELSE f_pid END AS purchase_event_id,
      |  CASE WHEN choose_b THEN epoch_us(ts) - epoch_us(b_ts)
      |       ELSE epoch_us(f_ts) - epoch_us(ts) END AS gap_us
      |FROM j""".stripMargin

  /** Exact-derived distribution stats: mean/stddev reconstructed from
    * exact integer sums (deterministic, engine-portable — Spark's
    * stddev aggregate uses a streaming algorithm whose result depends
    * on partition order), plus exact interpolated median. */
  def valueStats(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), cents(col("value")).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_c"),
        sum(col("c") * col("c")).as("sumsq_c"),
        percentile(col("c"), lit(0.5)).as("median_cents"))
      .select(col("event_type"), col("n"),
        (col("sum_c").cast("double") / col("n")).as("mean_cents"),
        sqrt((col("sumsq_c").cast("double") -
          col("sum_c").cast("double") * col("sum_c").cast("double") / col("n")) /
          (col("n") - 1)).as("std_cents"),
        col("median_cents"))

  val valueStatsSql: String = {
    val c = sqlCents("value")
    s"""WITH g AS (
       |  SELECT event_type, count(*) AS n,
       |    sum($c) AS sum_c, sum($c * $c) AS sumsq_c,
       |    quantile_cont($c, 0.5) AS median_cents
       |  FROM events GROUP BY 1)
       |SELECT event_type, n,
       |  sum_c::DOUBLE / n AS mean_cents,
       |  sqrt((sumsq_c::DOUBLE - sum_c::DOUBLE * sum_c::DOUBLE / n) / (n - 1)) AS std_cents,
       |  median_cents
       |FROM g""".stripMargin
  }

  /** Winsorization (outlier clamping) at nearest-rank p01/p99 per
    * event type: bounds come from an explicit rank window — exact
    * LONGS, so clamping and the clamped sum stay in integer arithmetic
    * end-to-end (interpolated percentiles would put engine-ulp doubles
    * on a comparison boundary). The bounds frame is 5 rows → broadcast
    * join-back; at 100 TB swap the rank window for approx_percentile
    * and accept sketch error in the bounds. */
  def winsorizedStats(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("event_type"), cents(col("value")).as("c"))
    val r = e
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("c"))))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
    val bounds = r.groupBy(col("event_type")).agg(
      min(when(col("rn") ===
        greatest(lit(1L), ceil(lit(0.01) * col("n"))), col("c"))).as("lo"),
      min(when(col("rn") === ceil(lit(0.99) * col("n")), col("c"))).as("hi"))
    e.join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(least(greatest(col("c"), col("lo")), col("hi"))).as("clamped_cents"),
        sum(when(col("c") < col("lo") || col("c") > col("hi"), 1L)
          .otherwise(0L)).as("n_clamped"))
  }

  val winsorizedStatsSql: String =
    s"""WITH e AS (SELECT event_type, ${sqlCents("value")} AS c FROM events),
       |r AS (SELECT event_type, c,
       |        row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
       |        count(*) OVER (PARTITION BY event_type) AS n
       |      FROM e),
       |b AS (SELECT event_type,
       |        min(CASE WHEN rn = greatest(1, ceil(0.01*n)::BIGINT)
       |                 THEN c END) AS lo,
       |        min(CASE WHEN rn = ceil(0.99*n)::BIGINT THEN c END) AS hi
       |      FROM r GROUP BY 1)
       |SELECT e.event_type, count(*) AS n_events,
       |  (sum(least(greatest(e.c, b.lo), b.hi)))::BIGINT AS clamped_cents,
       |  (sum(CASE WHEN e.c < b.lo OR e.c > b.hi THEN 1 ELSE 0 END))::BIGINT
       |    AS n_clamped
       |FROM e JOIN b USING (event_type) GROUP BY 1""".stripMargin

  /** Time-series gap-fill: the dense (hour × event_type) grid over the
    * observed span, missing cells as explicit zeros — what every
    * downstream resampler/chart needs. The grid is generated from one
    * global min/max (a broadcast scalar), cross-joined with the tiny
    * type dimension, then left-joined to the hourly aggregate; the
    * fact table shuffles once on (type, hour). */
  def gapFillHourly(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_type"),
      date_trunc("hour", col("ts")).as("h"), cents(col("value")).as("c"))
    val bounds = e.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val grid = bounds
      .select(explode(sequence(col("h0"), col("h1"),
        expr("interval 1 hour"))).as("h"))
      .crossJoin(e.select(col("event_type")).distinct())
    val agg = e.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
    grid.join(agg, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h").as("hour_start"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        coalesce(col("sc"), lit(0L)).as("value_cents"))
  }

  val gapFillHourlySql: String =
    s"""WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h,
       |    ${sqlCents("value")} AS c FROM events),
       |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
       |grid AS (SELECT t.h, et.event_type
       |         FROM b, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) t(h)
       |         CROSS JOIN (SELECT DISTINCT event_type FROM e) et),
       |a AS (SELECT event_type, h, count(*) AS n, sum(c) AS sc
       |      FROM e GROUP BY 1, 2)
       |SELECT g.event_type, g.h AS hour_start,
       |  (coalesce(n, 0))::BIGINT AS n_events,
       |  (coalesce(sc, 0))::BIGINT AS value_cents
       |FROM grid g LEFT JOIN a ON a.event_type = g.event_type AND a.h = g.h""".stripMargin

  /** Conversion funnel: clicks converting to a purchase by the same
    * user within one hour, daily. The existence probe is a left-semi
    * interval join — at scale the same bucketed-range shape as
    * [[graft.operators.RangeJoin]]; here user_id equi-keys carry the
    * shuffle so the range predicate only scans within user groups. */
  def conversionFunnel(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val converted = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") > col("ts") &&
        col("p_ts") <= col("ts") + expr("interval 1 hour"),
      "left_semi")
    clicks.groupBy(col("day_us")).agg(count(lit(1)).as("n_clicks"))
      .join(converted.groupBy(col("day_us")).agg(count(lit(1)).as("n_conv")),
        Seq("day_us"), "left")
      .select(col("day_us"), col("n_clicks"),
        coalesce(col("n_conv"), lit(0L)).as("n_converted"))
  }

  val conversionFunnelSql: String =
    """WITH clicks AS (SELECT user_id, ts,
      |                  epoch_us(date_trunc('day', ts)) AS day_us
      |                FROM events WHERE event_type = 'click'),
      |conv AS (SELECT c.day_us, count(*) AS n_conv
      |         FROM clicks c
      |         WHERE EXISTS (SELECT 1 FROM events p
      |                       WHERE p.event_type = 'purchase'
      |                         AND p.user_id = c.user_id
      |                         AND p.ts > c.ts
      |                         AND p.ts <= c.ts + INTERVAL 1 HOUR)
      |         GROUP BY 1)
      |SELECT c.day_us, count(*) AS n_clicks,
      |  (coalesce(max(n_conv), 0))::BIGINT AS n_converted
      |FROM clicks c LEFT JOIN conv ON conv.day_us = c.day_us
      |GROUP BY 1""".stripMargin

  /** Distribution drift between the early and late half of the event
    * stream (split at the midpoint timestamp), per event type:
    * total-variation distance over log2 value-cents histograms —
    * integer-exact, log-free (see [[graft.operators.Drift]]), so the
    * oracle replays the statistic itself, not an epsilon-ball. */
  def valueDrift(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"),
      unix_micros(col("ts")).as("us"), cents(col("value")).as("v"))
    val bounds = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
    val tagged = ev.crossJoin(broadcast(bounds))
      .withColumn("late", col("us") > expr("(mn + mx) div 2"))
    graft.operators.Drift.tvdLog2(
      tagged.filter(!col("late")), tagged.filter(col("late")),
      "event_type", "v")
  }

  val valueDriftSql: String =
    s"""WITH e AS (SELECT event_type, epoch_us(ts) AS us,
       |             ${sqlCents("value")} AS v FROM events),
       |bnd AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
       |ca AS (SELECT event_type, v FROM e, bnd WHERE us <= mid),
       |cbb AS (SELECT event_type, v FROM e, bnd WHERE us > mid),
       |ha AS (SELECT event_type,
       |         CASE WHEN v > 0 THEN length(bin(v)) ELSE 0 END AS bin,
       |         count(*) AS cnt_a
       |       FROM ca GROUP BY 1, 2),
       |hb AS (SELECT event_type,
       |         CASE WHEN v > 0 THEN length(bin(v)) ELSE 0 END AS bin,
       |         count(*) AS cnt_b
       |       FROM cbb GROUP BY 1, 2),
       |j AS (SELECT coalesce(ha.event_type, hb.event_type) AS event_type,
       |        coalesce(ha.bin, hb.bin) AS bin,
       |        coalesce(cnt_a, 0)::BIGINT AS cnt_a,
       |        coalesce(cnt_b, 0)::BIGINT AS cnt_b
       |      FROM ha FULL OUTER JOIN hb
       |        ON ha.event_type = hb.event_type AND ha.bin = hb.bin),
       |tot AS (SELECT event_type, sum(cnt_a)::BIGINT AS n_a,
       |          sum(cnt_b)::BIGINT AS n_b
       |        FROM j GROUP BY 1)
       |SELECT j.event_type, n_a, n_b,
       |  CASE WHEN n_a = 0 OR n_b = 0 THEN 1.0
       |       ELSE round(sum(abs(cnt_a*n_b - cnt_b*n_a))::DOUBLE /
       |              (2.0 * n_a * n_b), 6) END AS tvd
       |FROM j JOIN tot ON j.event_type = tot.event_type
       |GROUP BY 1, 2, 3""".stripMargin

  /** Robust per-type outlier audit over event values: the median/MAD
    * rule of [[graft.operators.Anomaly]] at k=5, every statistic an
    * exact integer (doubled median, quadrupled MAD, flag test
    * multiplied through by 4), so the oracle replays the order
    * statistics AND the flag decisions bit-for-bit. */
  def madAnomalies(s: SparkSession, d: String): DataFrame =
    Anomaly.madOutlierStats(
      Tables.events(s, d)
        .select(col("event_type"), cents(col("value")).as("c")),
      "event_type", col("c"), k = 5L)

  val madAnomaliesSql: String =
    s"""WITH e AS (SELECT event_type, ${sqlCents("value")} AS c FROM events),
       |r AS (SELECT event_type, c,
       |        row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
       |        count(*) OVER (PARTITION BY event_type) AS n
       |      FROM e),
       |m AS (SELECT event_type, max(n) AS n,
       |        (min(CASE WHEN rn = (n+1)//2 THEN c END) +
       |         min(CASE WHEN rn = (n+2)//2 THEN c END)) AS med2
       |      FROM r GROUP BY 1),
       |dv AS (SELECT e.event_type, e.c, abs(2*e.c - m.med2) AS dd,
       |         m.n, m.med2
       |       FROM e JOIN m USING (event_type)),
       |r2 AS (SELECT event_type, dd,
       |         row_number() OVER (PARTITION BY event_type ORDER BY dd) AS rn,
       |         count(*) OVER (PARTITION BY event_type) AS n2
       |       FROM dv),
       |md AS (SELECT event_type,
       |         (min(CASE WHEN rn = (n2+1)//2 THEN dd END) +
       |          min(CASE WHEN rn = (n2+2)//2 THEN dd END)) AS mad4
       |       FROM r2 GROUP BY 1)
       |SELECT d.event_type, (max(d.n))::BIGINT AS n,
       |  (max(d.med2))::BIGINT AS med2, (max(md.mad4))::BIGINT AS mad4,
       |  (sum(CASE WHEN 2*d.dd > 5*md.mad4 THEN 1 ELSE 0 END))::BIGINT
       |    AS n_anom,
       |  (sum(CASE WHEN 2*d.dd > 5*md.mad4 THEN d.c ELSE 0 END))::BIGINT
       |    AS anom_sum
       |FROM dv d JOIN md USING (event_type) GROUP BY 1""".stripMargin

  /** Behavioral transition matrix (the Markov-chain feature table for
    * sequence models / funnel analysis): per-user event streams ordered
    * by (ts, event_id) — a TOTAL order, so lag() is deterministic —
    * reduced to (prev_type → type) counts plus exact summed gap
    * seconds. One shuffle on user_id for the window, one keyed
    * aggregation over ≤|types|² groups. */
  def eventTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      // epoch MICROSECONDS: integer-exact in both engines (a seconds
      // cast differs — Spark floors, DuckDB's double epoch() rounds)
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("gap_us")).as("gap_us_sum"))
  }

  val eventTransitionsSql: String =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    epoch_us(ts) AS us,
      |    lag(event_type) OVER w AS prev_type,
      |    lag(epoch_us(ts)) OVER w AS prev_us
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT prev_type, event_type, count(*) AS n,
      |  (sum(us - prev_us))::BIGINT AS gap_us_sum
      |FROM s WHERE prev_type IS NOT NULL
      |GROUP BY 1, 2""".stripMargin

  /** Per-user exponentially-weighted running value (α = 2/10), the
    * smoothing primitive for per-entity state features. The recurrence
    * `r' = (2·c + 8·r) div 10` is a sequential integer fold, inherently
    * order-dependent — so it runs as an ARRAY fold over each user's
    * time-ordered values (millions of keys × bounded series each: the
    * right distributed shape — one shuffle to the key, fold inside the
    * row; an unbounded single series would instead chunk + re-fold).
    * Fixed-point `div` keeps every step engine-exact: DuckDB's
    * list_reduce seeds with the first element, so the Spark fold seeds
    * with `arr[1]` to match. */
  def userEwma(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("us"), col("event_id"),
          cents(col("value")).as("c")).as("e"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(col("e"))).as("__arr"))
      .withColumn("__vals", expr("transform(__arr, x -> x.c)"))
      .withColumn("ewma_cents",
        expr("""aggregate(slice(__vals, 2, greatest(size(__vals) - 1, 0)),
                __vals[0], (acc, x) -> (2*x + 8*acc) div 10)"""))
      .select(col("user_id"), col("n_events"), col("ewma_cents"))

  val userEwmaSql: String =
    s"""WITH e AS (SELECT user_id, ts, event_id,
       |    ${sqlCents("value")} AS c FROM events)
       |SELECT user_id, count(*) AS n_events,
       |  list_reduce(list(c ORDER BY ts, event_id),
       |    (acc, x) -> (2*x + 8*acc) // 10) AS ewma_cents
       |FROM e GROUP BY 1""".stripMargin

  /** q121's EWMA through the CHUNKED fold ([[graft.operators
    * .ChunkedFold.ewmaChunked]], 32-event segments): same recurrence,
    * same oracle, but no row ever holds a full series — the variant a
    * 100M-event hot entity needs. Running both against one oracle is
    * the cross-shape pin that the segment composition is exact. */
  def userEwmaChunked(s: SparkSession, d: String): DataFrame =
    graft.operators.ChunkedFold.ewmaChunked(
      Tables.events(s, d).select(col("user_id"), col("ts"),
        col("event_id"), cents(col("value")).as("c")),
      "user_id", Seq(col("ts"), col("event_id")), col("c"),
      num = 2, den = 10, chunkSize = 32)
      .withColumnRenamed("ewma", "ewma_cents")

  /** Sequence mining: top-20 event-type trigrams over per-user streams
    * (ordered by the (ts, event_id) total order) — the n-gram feature
    * table behavioral/sequence models train on. Two lags + one keyed
    * count over ≤|types|³ groups; trigrams never span users. */
  def eventTrigrams(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("t1", lag(col("event_type"), 2).over(w))
      .withColumn("t2", lag(col("event_type"), 1).over(w))
      .filter(col("t1").isNotNull)
      .groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  val eventTrigramsSql: String =
    """WITH s AS (
      |  SELECT user_id, event_type AS t3,
      |    lag(event_type, 2) OVER w AS t1,
      |    lag(event_type, 1) OVER w AS t2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT t1, t2, t3, count(*) AS n
      |FROM s WHERE t1 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin

  /** Event-time RANGE-frame rolling features: per event, the count and
    * exact value sum of the SAME USER's events in the trailing 7 days
    * (inclusive) — the point-in-time feature join done as one window
    * pass instead of a self-join. The frame is a rangeBetween over
    * epoch microseconds (integer event time), so boundaries are exact
    * in both engines; rows-frames can't express this (ties and gaps
    * shift row offsets). Summarized per (user, event_type) by the max
    * rolling count and total rolling cents to keep the gate compact
    * while staying sensitive to every per-event frame. */
  def rollingWindow7d(s: SparkSession, d: String): DataFrame = {
    val sevenDaysUs = 7L * 24 * 3600 * 1000000
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-sevenDaysUs, 0)
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), cents(col("value")).as("c"))
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_cents", sum(col("c")).over(w))
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(col("roll_n")).as("max_roll_n"),
        sum(col("roll_cents")).as("sum_roll_cents"))
  }

  val rollingWindow7dSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS us,
       |    ${sqlCents("value")} AS c
       |  FROM events),
       |r AS (
       |  SELECT user_id, event_type,
       |    count(*) OVER w AS roll_n,
       |    sum(c) OVER w AS roll_cents
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY us
       |    RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW))
       |SELECT user_id, event_type,
       |  max(roll_n)::BIGINT AS max_roll_n,
       |  sum(roll_cents)::BIGINT AS sum_roll_cents
       |FROM r GROUP BY 1, 2""".stripMargin

  /** q158: [[graft.functions.TopKRows]] — per-group top-k as a
    * MERGEABLE typed Aggregator. Not a speed play (Spark ≥3.5's
    * WindowGroupLimit already bounds the window form — they tie at
    * 20M rows, see ProfileScratch `topk`): the point is top-k as a
    * COLUMN, composable into one aggregation pass next to counts /
    * sums / sketches and usable where window functions aren't
    * (streaming aggregations, stored rollup partials). The oracle IS
    * the window form — the contract that the bounded-state path
    * selects exactly the rows a rank-filter would, under the total
    * (cents DESC, event_id ASC) order. */
  def topKPerType(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TopKAgg
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"),
        TopKAgg.topK(col("event_id"), cents(col("value")), 5).as("top"))
      .select(col("event_type"), col("n_events"), col("value_cents"),
        posexplode(col("top")))
      .select(col("event_type"), col("n_events"), col("value_cents"),
        (col("pos") + 1).as("rank"),
        col("col._2").as("event_id"), col("col._1").as("cents"))
  }

  val topKPerTypeSql: String =
    s"""WITH c AS (
       |  SELECT event_type, event_id, ${sqlCents("value")} AS c
       |  FROM events),
       |a AS (
       |  SELECT event_type, count(*)::BIGINT AS n_events,
       |    sum(c)::BIGINT AS value_cents
       |  FROM c GROUP BY 1),
       |r AS (
       |  SELECT event_type, event_id, c, row_number() OVER (
       |    PARTITION BY event_type ORDER BY c DESC, event_id) AS rank
       |  FROM c)
       |SELECT r.event_type, n_events, value_cents, rank, event_id,
       |  c AS cents
       |FROM r JOIN a ON r.event_type = a.event_type
       |WHERE rank <= 5""".stripMargin

  /** q161: [[graft.streaming.EventStreams.slidingCounts]] — sliding
    * event-time windows (2h span / 30min slide: each event lands in
    * exactly 4 overlapping windows), the one windowing shape that was
    * spec-only. The oracle replays Spark's epoch-aligned window
    * assignment arithmetically: an event in 30-min slot s belongs to
    * windows starting at slots s−3 … s — a 4-row lateral expansion,
    * no window function at all, which is also WHY the operator scales
    * (the expansion factor is span/slide, fixed at plan time). */
  def slidingWindowCounts(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventStreams.slidingCounts(
      Tables.events(s, d)
        .select(col("ts"), col("event_type")))
      .select(unix_micros(col("win_start")).as("win_start_us"),
        col("event_type"), col("n_events"))

  val slidingWindowCountsSql: String =
    """WITH e AS (
      |  SELECT epoch_us(ts) // 1800000000 AS slot, event_type
      |  FROM events),
      |w AS (
      |  SELECT (slot - i) * 1800000000 AS win_start_us, event_type
      |  FROM e, unnest([0, 1, 2, 3]) t(i))
      |SELECT win_start_us, event_type, count(*)::BIGINT AS n_events
      |FROM w GROUP BY 1, 2""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q161_sliding_window", slidingWindowCounts,
      Some(slidingWindowCountsSql)),
    Q("q158_topk_per_group", topKPerType, Some(topKPerTypeSql)),
    Q("q131_event_trigrams", eventTrigrams, Some(eventTrigramsSql)),
    Q("q132_rolling_7d", rollingWindow7d, Some(rollingWindow7dSql)),
    Q("q124_user_ewma_chunked", userEwmaChunked, Some(userEwmaSql)),
    Q("q25_tumbling_window", tumblingWindow, Some(tumblingWindowSql)),
    Q("q108_mad_anomalies", madAnomalies, Some(madAnomaliesSql)),
    Q("q118_event_transitions", eventTransitions, Some(eventTransitionsSql)),
    Q("q121_user_ewma", userEwma, Some(userEwmaSql)),
    Q("q26_sessionize", sessionize, Some(sessionizeSql)),
    Q("q27_json_props", jsonProps, Some(jsonPropsSql)),
    Q("q28_rollup_daily", rollupDaily, Some(rollupDailySql)),
    Q("q32_pivot_daily", pivotDaily, Some(pivotDailySql)),
    Q("q33_asof_join", asofPurchaseClick, Some(asofPurchaseClickSql)),
    Q("q179_asof_native", asofNativeErrorPurchase,
      Some(asofNativeErrorPurchaseSql)),
    Q("q195_asof_nearest", asofNearestErrorPurchase,
      Some(asofNearestErrorPurchaseSql)),
    Q("q200_asof_broadcast_dim", asofBroadcastDim,
      Some(asofBroadcastDimSql)),
    Q("q187_asof_forward", asofForwardErrorClick,
      Some(asofForwardErrorClickSql)),
    Q("q34_value_stats", valueStats, Some(valueStatsSql)),
    Q("q50_cube_daily", cubeDaily, Some(cubeDailySql)),
    Q("q59_grouping_sets", groupingSetsDaily, Some(groupingSetsDailySql)),
    Q("q67_winsorized_stats", winsorizedStats, Some(winsorizedStatsSql)),
    Q("q75_gap_fill", gapFillHourly, Some(gapFillHourlySql)),
    Q("q76_conversion_funnel", conversionFunnel, Some(conversionFunnelSql)),
    Q("q103_value_drift", valueDrift, Some(valueDriftSql)))
}
