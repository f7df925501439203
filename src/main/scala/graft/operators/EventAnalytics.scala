package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, QueryModule, Tables}

/** Event-log analytics over the `events` table — the batch half of the
  * streaming surface (same shapes a Structured Streaming job would
  * maintain incrementally): gap-based sessionization, conversion funnel,
  * weekly cohort retention. All window/aggregate compositions, fully
  * DuckDB-oracle-checked.
  *
  * Scale: every query partitions by `user_id` — bounded per-user event
  * counts keep WindowExec group buffers small; the shuffles are all on
  * user_id and reusable across the session/funnel/cohort stages.
  */
object EventAnalytics extends QueryModule {

  private def events(s: SparkSession, d: String): DataFrame =
    Tables.df(s, d, "events")

  /** Gap-based sessionization (30-minute inactivity): lag → gap flag →
    * running sum as session id → per-session stats. */
  val qSessionize: QueryDef = QueryDef(
    "q131_sessionize",
    (s, d) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val withGap = events(s, d)
        .withColumn("prev_ts", lag($"ts", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_ts".isNull ||
            unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      withGap.groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          (unix_timestamp(max($"ts")) - unix_timestamp(min($"ts")))
            .as("duration_s"))
        .groupBy($"user_id")
        .agg(max($"session_id").cast(LongType).as("n_sessions"),
          max($"n_events").as("max_session_events"),
          max($"duration_s").as("max_duration_s"))
        .orderBy($"user_id")
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id,
          ts
        FROM flagged),
      per_session AS (
        SELECT user_id, session_id, COUNT(*) AS n_events,
          CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts))) AS BIGINT) AS duration_s
        FROM sessions GROUP BY user_id, session_id)
      SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
        MAX(n_events) AS max_session_events,
        MAX(duration_s) AS max_duration_s
      FROM per_session GROUP BY user_id ORDER BY user_id"""))

  /** Conversion funnel view → click → purchase (time-ordered reach). */
  val qFunnel: QueryDef = QueryDef(
    "q132_funnel",
    (s, d) => {
      import s.implicits._
      val stage = events(s, d).groupBy($"user_id")
        .agg(
          min(when($"event_type" === "view", $"ts")).as("t_view"),
          min(when($"event_type" === "click", $"ts")).as("t_click"),
          min(when($"event_type" === "purchase", $"ts")).as("t_purchase"))
      stage.agg(
        count(lit(1)).as("n_users"),
        count($"t_view").as("viewed"),
        sum(when($"t_click" > $"t_view", 1).otherwise(0))
          .cast(LongType).as("clicked_after_view"),
        sum(when($"t_purchase" > $"t_click" && $"t_click" > $"t_view", 1)
          .otherwise(0)).cast(LongType).as("full_funnel"))
    },
    Some("""
      SELECT COUNT(*) AS n_users, COUNT(t_view) AS viewed,
        CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
          AS clicked_after_view,
        CAST(SUM(CASE WHEN t_purchase > t_click AND t_click > t_view
                      THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
      FROM (
        SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
          MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
          MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id)"""))

  /** Weekly cohort retention: users first seen in week 0 of the log,
    * still active N weeks later. */
  val qRetention: QueryDef = QueryDef(
    "q133_cohort_retention",
    (s, d) => {
      import s.implicits._
      val e = events(s, d)
      val firstSeen = e.groupBy($"user_id").agg(min($"ts").as("first_ts"))
      val origin = lit("2024-01-01 00:00:00").cast(TimestampType)
      val week = (c: org.apache.spark.sql.Column) =>
        floor((unix_timestamp(c) - unix_timestamp(origin)) / 604800L)
      val cohort0 = firstSeen.filter(week($"first_ts") === 0).select($"user_id")
      e.join(cohort0, Seq("user_id"))
        .groupBy(week($"ts").cast(IntegerType).as("week_n"))
        .agg(countDistinct($"user_id").as("active_users"))
        .orderBy($"week_n")
    },
    Some("""
      WITH cohort0 AS (
        SELECT user_id FROM events GROUP BY user_id
        HAVING floor((epoch(MIN(ts)) - epoch(TIMESTAMP '2024-01-01 00:00:00'))
                     / 604800) = 0)
      SELECT CAST(floor((epoch(ts) - epoch(TIMESTAMP '2024-01-01 00:00:00'))
                        / 604800) AS INT) AS week_n,
             COUNT(DISTINCT e.user_id) AS active_users
      FROM events e JOIN cohort0 USING (user_id)
      GROUP BY 1 ORDER BY 1"""))

  override def defs: Seq[QueryDef] = Seq(qSessionize, qFunnel, qRetention)
}
