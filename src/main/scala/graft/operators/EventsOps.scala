package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.Exact._

/** Event-log (time-series) operators over the `events` table.
  *
  * The parquet column `ts` is TIMESTAMP(NANOS) which Spark's vectorized
  * reader rejects; we read it as a nanosecond long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and do all time arithmetic in
  * epoch milliseconds — integer math that is identical in every engine
  * (DuckDB truncates ns → µs → ms the same way, verified empirically).
  *
  * Scale: e01/e02 are single-shuffle groupBys with map-side partial
  * aggregation; e03 is one shuffle on user_id + an in-partition window —
  * the canonical sessionization plan (no driver-side loops).
  */
object EventsOps {
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.Tables.load(s, dir, "events") // needs Tables.requiredConf at session build

  // ns -> ms as FLOOR division (pmod keeps it exact integer math): plain
  // DIV truncates toward zero, diverging from the DuckDB oracle's
  // epoch_ms flooring for pre-epoch (negative) timestamps.
  private val tsMs: Column = graft.Tables.eventTsMs

  /** SURVEY §2.5 A1/A6: per-type stats with exact value sums. */
  val e01 = QueryDef(
    "e01_event_stats",
    "per-event-type stats: counts, distinct users, ms range, exact sum",
    (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          min(tsMs).as("first_ms"),
          max(tsMs).as("last_ms"),
          moneySum(col("value")).as("total_value"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
      MIN(epoch_ms(CAST(ts AS TIMESTAMP))) AS first_ms,
      MAX(epoch_ms(CAST(ts AS TIMESTAMP))) AS last_ms,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Tumbling 1-hour windows (batch form of the streaming query st01). */
  val e02 = QueryDef(
    "e02_hourly_windows",
    "tumbling 1h window counts per event type",
    (s, dir) =>
      events(s, dir)
        .groupBy(
          // pmod floor, not truncating % — matches window()'s flooring
          // (st01) and the e12 convention for pre-epoch timestamps
          (tsMs - pmod(tsMs, lit(3600000L))).as("window_ms"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("window_ms"), col("event_type")),
    Some("""SELECT ms - (((ms % 3600000) + 3600000) % 3600000) AS window_ms, event_type,
        COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      FROM (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_type, user_id FROM events) t
      GROUP BY 1, 2 ORDER BY window_ms, event_type"""))

  /** Sessionization: 30-min inactivity gap splits sessions; one shuffle on
    * user_id, lag() within partition (the reference has no streaming — this
    * is the time-series extension the north star asks for).
    */
  val e03 = QueryDef(
    "e03_sessionize",
    "gap-based sessionization via lag window (30 min)",
    (s, dir) => {
      events(s, dir)
        .select(col("user_id"), col("event_id"), tsMs.as("ms"))
        .withColumn("prev_ms", lag(col("ms"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))))
        .withColumn("new_session",
          when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 1800000L, 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
             count(when(col("new_session") === 1, 1)).as("n_sessions"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, COUNT(*) AS n_events,
        COUNT(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 END) AS n_sessions
      FROM (SELECT user_id,
              epoch_ms(CAST(ts AS TIMESTAMP)) AS ms,
              lag(epoch_ms(CAST(ts AS TIMESTAMP))) OVER (
                PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_id) AS prev_ms
            FROM events) t
      GROUP BY user_id ORDER BY user_id"""))

  /** SURVEY §2.1 S2-adjacent: semi-structured extraction from the JSON-ish
    * `props` string via regexp (schema-on-read at the column level).
    */
  val e04 = QueryDef(
    "e04_props_extract",
    "regexp extraction from JSON-ish props column",
    (s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          regexp_extract(col("props"), "([0-9]+)", 1).cast("bigint").as("k_val"))
        .orderBy(col("event_id")),
    // TRY_CAST: a digitless props string extracts '' — Spark's cast
    // yields null there, but DuckDB's plain CAST('') aborts the oracle
    Some("""SELECT event_id, TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS k_val
      FROM events ORDER BY event_id"""))

  /** As-of join gate: each click event picks up the user's most recent
    * purchase at-or-before it (the trades⋈quotes temporal join). Runs the
    * [[AsofJoin]] union-sweep plan — one shuffle on user_id, no range-join
    * blow-up; the DuckDB oracle is a native ASOF LEFT JOIN. The purchase
    * side is pre-aggregated to one row per (user_id, ms) so the winner at
    * a tied timestamp is deterministic in both engines.
    */
  val e05 = QueryDef(
    "e05_asof_join",
    "as-of join: latest purchase at-or-before each click, per user",
    (s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), col("event_id"), tsMs.as("ms"), col("event_type"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ms"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ms").as("p_ms"))
        .agg(max(col("event_id")).as("p_id"))
        .select(col("user_id"), col("p_ms"), col("p_id"))
      AsofJoin.asof(clicks, purchases, Seq("user_id"),
          leftTime = "ms", rightTime = "p_ms")
        .select(col("event_id"), col("user_id"), col("ms"), col("p_id"), col("p_ms"))
        .orderBy(col("event_id"))
    },
    Some("""WITH ev AS (SELECT user_id, event_id,
              epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_type FROM events),
        c AS (SELECT user_id, event_id, ms FROM ev WHERE event_type = 'click'),
        p AS (SELECT user_id, ms AS p_ms, MAX(event_id) AS p_id
              FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT c.event_id, c.user_id, c.ms, p.p_id, p.p_ms
      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ms >= p.p_ms
      ORDER BY c.event_id"""))

  /** Exact per-group nearest-rank percentiles. Rank selection is pure
    * integer math — ceil(p*n/100) as (p*n + 99) DIV 100 — because n*0.95
    * in doubles rounds differently than the rational it approximates and
    * an engine is free to fuse it; integers are engine-proof. One keyed
    * sort window per group: the exact path when a group fits a partition
    * (here: per event type). At 100 TB prefer the mergeable sketch
    * (approx_percentile / e07's HLL analogue) — this gate is the exact
    * reference the sketch is validated against.
    */
  val e06 = QueryDef(
    "e06_percentiles",
    "per-type exact nearest-rank percentiles of value (p25/50/75/95)",
    (s, dir) => {
      val byType = Window.partitionBy(col("event_type"))
      val ranked = events(s, dir)
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("rk", row_number().over(
          byType.orderBy(col("value"), col("event_id"))))
        .withColumn("n", count(lit(1)).over(byType))
      def pick(p: Int) =
        max(when(col("rk") === expr(s"(n * $p + 99) DIV 100"), col("value")))
      ranked.groupBy(col("event_type"))
        .agg(max(col("n")).as("n"), pick(25).as("p25"), pick(50).as("p50"),
          pick(75).as("p75"), pick(95).as("p95"))
        .orderBy(col("event_type"))
    },
    Some("""WITH r AS (SELECT event_type, value,
          row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
          COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events)
      SELECT event_type, MAX(n) AS n,
        MAX(CASE WHEN rk = (n * 25 + 99) // 100 THEN value END) AS p25,
        MAX(CASE WHEN rk = (n * 50 + 99) // 100 THEN value END) AS p50,
        MAX(CASE WHEN rk = (n * 75 + 99) // 100 THEN value END) AS p75,
        MAX(CASE WHEN rk = (n * 95 + 99) // 100 THEN value END) AS p95
      FROM r GROUP BY event_type ORDER BY event_type"""))

  /** Sketch-based distinct counting: HyperLogLog++ (rsd 1%) next to the
    * exact count, gated on staying within 5%. At 100 TB the exact
    * countDistinct is a full (type, user) de-dup shuffle; the HLL sketch
    * is O(1) mergeable map-side state — this is THE count-distinct plan
    * at scale, and the gate pins that the sketch stays honest. The
    * sketch value itself is engine-specific, so the oracle checks the
    * tolerance flag, not the estimate.
    */
  val e07 = QueryDef(
    "e07_approx_distinct",
    "HLL++ approx distinct users per type, pinned within 5% of exact",
    (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")).cast("double") <=
            col("exact_users").cast("double") * 0.05).as("within_5pct"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        TRUE AS within_5pct
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Band (range) join gate: click-purchase pairs of the same user within
    * 10 minutes, via [[RangeJoin.banded]] — bucket-quantized equi-join
    * (3x fan-out on one side), not a sort-merge with an inequality
    * residual that degenerates per key. The DuckDB oracle is the naive
    * inequality join, which is fine at oracle scale.
    */
  val e08 = QueryDef(
    "e08_range_join",
    "banded range join: click-purchase pairs within 10 min per user",
    (s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), col("event_id"), tsMs.as("ms"), col("event_type"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ms").as("c_ms"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ms").as("p_ms"))
      RangeJoin.banded(clicks, purchases, Seq("user_id"),
          leftTime = "c_ms", rightTime = "p_ms", tolerance = 600000L)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          (col("c_ms") - col("p_ms")).as("delta_ms"))
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    },
    Some("""WITH ev AS (SELECT user_id, event_id,
              epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_type FROM events),
        c AS (SELECT user_id, event_id AS click_id, ms AS c_ms FROM ev
              WHERE event_type = 'click'),
        p AS (SELECT user_id, event_id AS purchase_id, ms AS p_ms FROM ev
              WHERE event_type = 'purchase')
      SELECT c.user_id, click_id, purchase_id, c_ms - p_ms AS delta_ms
      FROM c JOIN p ON c.user_id = p.user_id
        AND abs(c_ms - p_ms) <= 600000
      ORDER BY c.user_id, click_id, purchase_id"""))

  /** The declarative twin of e08: the user writes the natural keyless
    * `abs(l - r) <= tol` join and [[graft.functions.BandJoinRewrite]]
    * (injected by GraftFunctions.register) turns it into the bucketed
    * equi-join plan automatically — Spark's own planner would pick a
    * BroadcastNestedLoopJoin, the O(|L|·|R|) scale-killer (PlanSpec's
    * product-join sweep covers this gate, so the rewrite firing is load-
    * bearing, not decorative). Clicks are sampled so the keyless pair
    * count stays output-bounded at any SF.
    */
  val e09 = QueryDef(
    "e09_band_join_declarative",
    "keyless abs(l-r)<=tol join auto-rewritten to a bucketed equi-join",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val ev = events(s, dir)
        .select(col("event_id"), tsMs.as("ms"), col("event_type"))
      val clicks = ev.filter(col("event_type") === "click" &&
          pmod(col("event_id"), lit(17L)) === 0)
        .select(col("event_id").as("click_id"), col("ms").as("c_ms"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ms").as("p_ms"))
      clicks.join(purchases, abs(col("c_ms") - col("p_ms")) <= lit(600000L))
        .select(col("click_id"), col("purchase_id"),
          (col("c_ms") - col("p_ms")).as("delta_ms"))
        .orderBy(col("click_id"), col("purchase_id"))
    },
    Some("""WITH ev AS (SELECT event_id,
              epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_type FROM events),
        c AS (SELECT event_id AS click_id, ms AS c_ms FROM ev
              WHERE event_type = 'click' AND event_id % 17 = 0),
        p AS (SELECT event_id AS purchase_id, ms AS p_ms FROM ev
              WHERE event_type = 'purchase')
      SELECT click_id, purchase_id, c_ms - p_ms AS delta_ms
      FROM c JOIN p ON abs(c_ms - p_ms) <= 600000
      ORDER BY click_id, purchase_id"""))

  /** Cohort retention — the classic product-analytics events workload:
    * cohort = each user's first active day; for every (cohort day,
    * day offset) cell, how many of that cohort's users were active. Two
    * keyed aggregations and one join, all on integer day arithmetic
    * (ms floor-divided by 86_400_000 — engine-identical), so the whole
    * matrix is hash-exact. At scale: the (user, day) distinct and the
    * first-day aggregate are each one user-keyed shuffle with map-side
    * combine; the cohort join is keyed by user; the final cell rollup is
    * bounded by days², not events.
    */
  val e10 = QueryDef(
    "e10_cohort_retention",
    "cohort-day x day-offset active-user retention matrix",
    (s, dir) => {
      // ns -> ms -> day, all floor divisions (pmod form, see tsMs)
      val ms = graft.Tables.EventTsMsSql
      val days = events(s, dir)
        .select(col("user_id"),
          expr(s"(($ms) - pmod(($ms), 86400000)) DIV 86400000").as("day"))
        .distinct()
      val cohorts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      days.join(cohorts, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_users")) // (user, day) is distinct -> count = users
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    Some("""WITH d AS (SELECT DISTINCT user_id,
              epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 AS day
            FROM events),
      c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
      SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
             COUNT(*) AS n_users
      FROM d JOIN c ON d.user_id = c.user_id
      GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""))

  /** Ordered funnel — the other classic product-analytics shape next to
    * e10's cohorts: how many users progress view → click → purchase IN
    * ORDER. Stage k's anchor is the user's earliest stage-k event at or
    * after their stage-(k-1) anchor (the standard earliest-completion
    * funnel), all in exact integer ms. Three user-keyed aggregations and
    * two user-keyed joins — no event self-join blow-up: each stage
    * touches only its own event-type slice.
    */
  val e11 = QueryDef(
    "e11_funnel",
    "ordered view->click->purchase funnel: users reaching each stage",
    (s, dir) => {
      val e = events(s, dir)
        .select(col("user_id"), col("event_type"), graft.Tables.eventTsMs.as("ms"))
      def stage(tpe: String) = e.filter(col("event_type") === tpe)
      val v = stage("view").groupBy(col("user_id")).agg(min(col("ms")).as("v_ms"))
      val c = stage("click").join(v, Seq("user_id"))
        .filter(col("ms") >= col("v_ms"))
        .groupBy(col("user_id")).agg(min(col("ms")).as("c_ms"))
      val p = stage("purchase").join(c, Seq("user_id"))
        .filter(col("ms") >= col("c_ms"))
        .groupBy(col("user_id")).agg(min(col("ms")).as("p_ms"))
      v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("stage"), col("n_users"))
        .unionAll(c.agg(count(lit(1)).as("n_users"))
          .select(lit("2_click").as("stage"), col("n_users")))
        .unionAll(p.agg(count(lit(1)).as("n_users"))
          .select(lit("3_purchase").as("stage"), col("n_users")))
        .orderBy(col("stage"))
    },
    Some("""WITH e AS (SELECT user_id, event_type,
              epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
      v AS (SELECT user_id, MIN(ms) AS v_ms FROM e
            WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.ms) AS c_ms
            FROM e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ms >= v.v_ms
            GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(e.ms) AS p_ms
            FROM e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ms >= c.c_ms
            GROUP BY e.user_id)
      SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
      UNION ALL SELECT '2_click', COUNT(*) FROM c
      UNION ALL SELECT '3_purchase', COUNT(*) FROM p
      ORDER BY stage"""))

  /** HOPPING (sliding) windows — e02's tumbling twin via Spark's real
    * `window(ts, size, slide)` operator: every event lands in size/slide
    * = 4 overlapping windows, so the relation grows 4× BEFORE the keyed
    * aggregation (a narrow generate, then the same single-shuffle
    * map-side-combinable groupBy as e02 — never a self-join of window
    * ranges). The oracle replays the hop expansion arithmetically:
    * window starts are floor₁₅ₘᵢₙ(ms) − i·15min for i in 0..3.
    */
  val e12 = QueryDef(
    "e12_hopping_windows",
    "hopping 1h/15min window counts per event type (window size > slide)",
    (s, dir) =>
      events(s, dir)
        .select(
          window(graft.Tables.eventTsAsTimestamp,
            "1 hour", "15 minutes").as("w"),
          col("event_type"), col("user_id"))
        .groupBy(unix_millis(col("w.start")).as("window_ms"), col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("window_ms"), col("event_type")),
    Some("""WITH e AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ms,
              event_type, user_id FROM events)
      SELECT (ms - (((ms % 900000) + 900000) % 900000))
               - 900000 * CAST(i AS BIGINT) AS window_ms,
             event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      FROM e, (SELECT unnest(range(4)) AS i) hops
      GROUP BY 1, 2 ORDER BY window_ms, event_type"""))

  val all: Seq[QueryDef] =
    Seq(e01, e02, e03, e04, e05, e06, e07, e08, e09, e10, e11, e12)
}
