package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}

/** Temporal operators beyond plain equi-joins: native session windows,
  * as-of joins, and point-in-interval range joins.
  *
  * The reference's surface (Spark 2.1) has none of these as operators —
  * its windowed-join uses are covered by `TimeWindow` + equi-join (SURVEY
  * §2.3 "No range/as-of/interval join in reference") — but they are core
  * event-pipeline shapes, so the engine provides them Spark-first:
  * session_window is native (Spark 3.2+); as-of and range joins are
  * composed in `graft.api.Graft` from one key-shuffle + window pass and a
  * binned equi-join respectively, both of which survive a 100× scale-up
  * where a naive inequality join (broadcast nested loop) would not.
  *
  * All three are DuckDB-checked: gaps-and-islands SQL for sessions,
  * native ASOF JOIN for the as-of, a plain inequality join for the range.
  */
object Temporal extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  /** Native session_window (gap = 30 min) per user over the events table.
    * Session end = last event + gap (Spark's definition; the oracle
    * reproduces it with a lag()-based island numbering). */
  val qSessionWindow: QueryDef = QueryDef(
    "q139_session_window",
    (s, d) => {
      import s.implicits._
      t(s, d, "events")
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", $"w.start".as("session_start"),
          $"w.end".as("session_end"), $"n_events")
        .orderBy($"user_id", $"session_start")
    },
    Some("""
      WITH o AS (
        SELECT user_id, ts,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 OR ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          + INTERVAL 30 MINUTE
               THEN 1 ELSE 0 END AS brk
        FROM events),
      g AS (
        SELECT user_id, ts,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
        FROM o)
      SELECT user_id, MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 30 MINUTE AS session_end,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM g GROUP BY user_id, sid
      ORDER BY user_id, session_start"""))

  /** As-of join: each purchase matched to the same user's most recent
    * click at-or-before it (attribution). Oracle = DuckDB's native ASOF
    * JOIN, so the composed operator is checked against a first-class
    * implementation of the semantics. */
  val qAsofJoin: QueryDef = QueryDef(
    "q140_asof_join",
    (s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
      graft.api.Graft.asofJoin(purchases, clicks,
          keyCols = Seq("user_id"), leftTimeCol = "ts", rightTimeCol = "click_ts")
        .select($"purchase_id", $"user_id", $"ts", $"click_id",
          ((unix_micros($"ts") - unix_micros($"click_ts")) / lit(1000000L))
            .cast("long").as("gap_s"))
        .orderBy($"purchase_id")
    },
    Some("""
      WITH l AS (SELECT event_id AS purchase_id, user_id, ts
                 FROM events WHERE event_type = 'purchase'),
           r AS (SELECT event_id AS click_id, user_id, ts AS click_ts
                 FROM events WHERE event_type = 'click')
      SELECT l.purchase_id, l.user_id, l.ts, r.click_id,
             CAST((epoch_us(l.ts) - epoch_us(r.click_ts)) // 1000000
                  AS BIGINT) AS gap_s
      FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.click_ts
      ORDER BY l.purchase_id"""))

  /** Pure (no equi-key) range join: purchases inside ±30 min of any error
    * event from a monitored user set. The binned plan shuffles each point
    * once and each interval twice (60 min span / 30 min bins ≈ 2-3 bins);
    * the oracle runs the same inequality join directly. */
  val qRangeJoin: QueryDef = QueryDef(
    "q141_range_join",
    (s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
      val intervals = ev.filter($"event_type" === "error" && $"user_id" <= 5)
        .select($"event_id".as("err_id"),
          (unix_micros($"ts") - lit(1800000000L)).as("t0"),
          (unix_micros($"ts") + lit(1800000000L)).as("t1"))
      val points = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), unix_micros($"ts").as("pt"))
      graft.api.Graft.rangeJoin(points, intervals,
          pointCol = "pt", startCol = "t0", endCol = "t1",
          binWidth = 1800000000L)
        .groupBy($"err_id")
        .agg(count(lit(1)).as("n_nearby"), min($"purchase_id").as("first_purchase"))
        .orderBy($"err_id")
    },
    Some("""
      WITH iv AS (SELECT event_id AS err_id,
                         ts - INTERVAL 30 MINUTE AS t0,
                         ts + INTERVAL 30 MINUTE AS t1
                  FROM events WHERE event_type = 'error' AND user_id <= 5),
           pt AS (SELECT event_id AS purchase_id, ts
                  FROM events WHERE event_type = 'purchase')
      SELECT err_id, CAST(COUNT(*) AS BIGINT) AS n_nearby,
             MIN(purchase_id) AS first_purchase
      FROM iv JOIN pt ON pt.ts >= iv.t0 AND pt.ts <= iv.t1
      GROUP BY err_id ORDER BY err_id"""))

  override def defs: Seq[QueryDef] = Seq(qSessionWindow, qAsofJoin, qRangeJoin)
}
