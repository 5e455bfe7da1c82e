package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream analytics (round 4): the batch shapes of the classic
  * streaming workloads — native session windows, sliding (hopping)
  * windows, ordered funnels, cohort retention (q42/q43 already cover
  * tumbling rollups and manual gap sessionization). SURVEY §2.C notes
  * the reference
  * has no event-time windowing (its only time is the log position), so
  * these are the *surplus* Spark surface the LLM-pipeline extensions
  * need; each is written with the partitioning that survives 100 TB
  * (every shuffle is keyed by user/cohort/bucket — no global sorts
  * except the final presentation ORDER BY the oracle also pays).
  *
  * `ts` is INT64 nanos under `nanosAsLong` (SparkEntry.configure);
  * queries truncate to µs (`ts div 1000`) to match DuckDB's parquet
  * ns→µs coercion, exactly like q32's as-of join.
  */
object EventQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // --------------------------------------------------------------------
  // q82 — Spark's NATIVE session-window operator (`session_window()`),
  // the declarative form of q43's manual lag+cumsum sessionization: the
  // planner owns session merging (and under readStream this exact
  // expression becomes stateful session aggregation with watermark
  // eviction). Semantics differ from q43 at the boundary: a session
  // window spans [t, t+gap), so a follow-up event at EXACTLY gap
  // distance starts a new session (q43's `>` keeps it) — the oracle
  // states the session_window rule (`>= gap` splits).
  private val gapUs = 30L * 60 * 1000000
  private val q82 = QueryDef(
    "q82_session_window",
    (s, dir) =>
      t(s, dir, "events")
        .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("t"))
        .groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("sess_start"),
          unix_micros(col("session_window.end")).as("sess_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("sess_start")),
    Some(s"""WITH e AS (
        SELECT user_id, epoch_us(ts) AS tsu, event_id FROM events),
      flagged AS (
        SELECT *, CASE WHEN lag(tsu) OVER w IS NULL
            OR tsu - lag(tsu) OVER w >= $gapUs THEN 1 ELSE 0 END AS boundary
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
      sess AS (
        SELECT *, sum(boundary) OVER (PARTITION BY user_id
          ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged)
      SELECT user_id, min(tsu) AS sess_start,
        max(tsu) + $gapUs AS sess_end, count(*) AS n_events
      FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start"""))

  // --------------------------------------------------------------------
  // q83 — SLIDING (hopping) windows through Spark's `window()` with
  // slide < width: 2-hour windows every hour, so each event lands in
  // exactly width/slide = 2 windows. q42's date_trunc tumbling rollup
  // can't express overlap; this is the real windowed-aggregation
  // operator (`Expand` + hash agg — the event is replicated per
  // overlapping window BEFORE the shuffle, so the plan stays one
  // exchange at any scale). Window starts emitted as epoch seconds.
  private val q83 = QueryDef(
    "q83_sliding_window",
    (s, dir) =>
      t(s, dir, "events")
        .select(timestamp_micros(expr("ts div 1000")).as("t"),
          col("event_type"), col("value"))
        .groupBy(window(col("t"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type")),
    Some("""WITH hop AS (
        SELECT epoch_us(ts) AS tsu, event_type, value, unnest([0, 1]) AS off
        FROM events)
      SELECT (tsu // 3600000000 - off) * 3600 AS win_start,
        event_type, count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM hop GROUP BY 1, 2 ORDER BY win_start, event_type"""))

  // --------------------------------------------------------------------
  // q84 — ordered funnel view→click→purchase: each stage's timestamp
  // must be strictly after the previous stage's. Implemented as one
  // hash aggregation per user over stage-tagged minima computed from a
  // single ordered window pass (no self-joins): first view, then the
  // first click after that view, then the first purchase after that
  // click. Everything is keyed by user_id — one shuffle at any scale.
  private val q84 = QueryDef(
    "q84_event_funnel",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tsn"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val staged = t(s, dir, "events")
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), expr("ts div 1000").as("tsn"),
          col("event_id"), col("event_type"))
        // running first-view ts as of each row (ordered pass #1)
        .withColumn("v1", min(when(col("event_type") === "view", col("tsn"))).over(w))
        // first click strictly after the first view
        .withColumn("c_ok", when(col("event_type") === "click" &&
          col("tsn") > col("v1"), col("tsn")))
        .withColumn("c1", min(col("c_ok")).over(w))
        .withColumn("p_ok", when(col("event_type") === "purchase" &&
          col("tsn") > col("c1"), col("tsn")))
      staged.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("tsn"))).as("t_view"),
          min(col("c_ok")).as("t_click"),
          min(col("p_ok")).as("t_purchase"))
        .agg(count(col("t_view")).as("n_view"),
          count(col("t_click")).as("n_view_click"),
          count(col("t_purchase")).as("n_full_funnel"))
    },
    Some("""WITH e AS (
        SELECT user_id, epoch_us(ts) AS tsn, event_id, event_type
        FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      u AS (SELECT user_id,
          min(CASE WHEN event_type = 'view' THEN tsn END) AS t_view
        FROM e GROUP BY user_id),
      c AS (SELECT e.user_id, min(e.tsn) AS t_click
        FROM e JOIN u ON e.user_id = u.user_id
        WHERE e.event_type = 'click' AND e.tsn > u.t_view
        GROUP BY e.user_id),
      p AS (SELECT e.user_id, min(e.tsn) AS t_purchase
        FROM e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.tsn > c.t_click
        GROUP BY e.user_id)
      SELECT count(u.t_view) AS n_view, count(c.t_click) AS n_view_click,
        count(p.t_purchase) AS n_full_funnel
      FROM u LEFT JOIN c ON u.user_id = c.user_id
             LEFT JOIN p ON u.user_id = p.user_id"""))

  // --------------------------------------------------------------------
  // q85 — cohort retention: users grouped by first-active day, fraction
  // still active N days later. Two keyed aggregations (user_id, then
  // (cohort, offset)) — the first-seen frame is a per-user min that at
  // scale is the incremental "user profile" table a real pipeline
  // maintains; no global operation anywhere.
  private val q85 = QueryDef(
    "q85_cohort_retention",
    (s, dir) => {
      val days = t(s, dir, "events")
        .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
        .distinct()
      val first = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
      days.join(first, "user_id")
        .withColumn("offset", col("day") - col("cohort"))
        .groupBy(col("cohort"), col("offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort"), col("offset"))
    },
    Some("""WITH days AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      first AS (SELECT user_id, min(day) AS cohort FROM days GROUP BY user_id)
      SELECT f.cohort, d.day - f.cohort AS "offset",
        count(DISTINCT d.user_id) AS n_active
      FROM days d JOIN first f ON d.user_id = f.user_id
      GROUP BY 1, 2 ORDER BY cohort, "offset""""))

  // --------------------------------------------------------------------
  // q90 — skew-immune aggregation through the salting toolbox
  // ([[graft.functions.SkewUtils]]): per-type distinct users via
  // value-hash salting (each distinct value lands in exactly one
  // bucket, so partial distinct counts are disjoint and SUM exactly)
  // and an exact decimal sum via partition salting. On a 100 TB log
  // where one event type is 90% of rows, the salted two-phase shape
  // keeps every reducer bounded at 1/buckets of the hot key — the
  // oracle states the plain aggregation it must equal.
  private val q90 = QueryDef(
    "q90_skew_salted_agg",
    (s, dir) => {
      import graft.functions.SkewUtils
      val ev = t(s, dir, "events")
      val users = SkewUtils.saltedCountDistinct(
        ev, Seq("event_type"), col("user_id"), "n_users")
      val totals = SkewUtils.saltedSum(
        ev, Seq("event_type"),
        col("value").cast("decimal(18,2)"), "__t")
        .select(col("event_type"), col("__t").cast("double").as("total_value"))
      users.join(totals, "event_type").orderBy(col("event_type"))
    },
    Some("""SELECT event_type,
      count(DISTINCT user_id) AS n_users,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY event_type ORDER BY event_type"""))

  val defs: Seq[QueryDef] = Seq(q82, q83, q84, q85, q90)
}
