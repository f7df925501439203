package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.Exact.dsumSql

/** Window functions (SURVEY.md §2.5): ranking, running frames, offset
  * (lead/lag/first/last), distribution (ntile/percent_rank/cume_dist),
  * RANGE frames. Reference: `sql/core/.../window/WindowExec.scala:82` with
  * frame processors in `WindowFunctionFrame.scala`.
  *
  * Scale: WindowExec buffers one partition-key group at a time (spilling
  * via UnsafeExternalSorter), so `partitionBy` keys must have bounded group
  * size — all queries here partition by customer/nation keys. The one
  * global window (q35) is flagged: at 100 TB you'd compute distribution
  * ranks via a two-pass aggregate, not a single-task window.
  */
object Windows extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  /** Top-N per group: row_number/rank/dense_rank over a deterministic
    * (value, key) order. */
  val qRank: QueryDef = QueryDef(
    "q33_window_rank",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, d, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .filter($"rn" <= 3)
        .orderBy($"o_custkey", $"rn")
    },
    Some("""
      SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** Running totals — growing ROWS frame; decimal sum keeps the running
    * value independent of the frame processor's accumulation strategy
    * (Spark adds incrementally; other engines may use segment trees). */
  val qRunning: QueryDef = QueryDef(
    "q34_window_running",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select($"o_custkey", $"o_orderkey",
          sum($"o_totalprice".cast(DecimalType(18, 6))).over(w)
            .cast(DoubleType).as("running_total"),
          count(lit(1)).over(w).as("running_n"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_total,
        COUNT(*) OVER w AS running_n
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""))

  /** Offset frames: lead/lag/first_value/last_value. */
  val qLeadLag: QueryDef = QueryDef(
    "q35_window_leadlag",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select($"o_custkey", $"o_orderkey",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          first($"o_orderkey").over(wFull).as("first_order"),
          last($"o_orderkey").over(wFull).as("last_order"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
        lag(o_totalprice, 1) OVER w AS prev_price,
        lead(o_totalprice, 1) OVER w AS next_price,
        first_value(o_orderkey) OVER wf AS first_order,
        last_value(o_orderkey) OVER wf AS last_order
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey"""))

  /** Distribution functions over a single ordered stream. Global window =
    * one task; acceptable for a dimension table, never for a fact table. */
  val qNtile: QueryDef = QueryDef(
    "q36_window_ntile",
    (s, d) => {
      import s.implicits._
      val w = Window.orderBy($"c_acctbal", $"c_custkey")
      t(s, d, "customer")
        .select($"c_custkey",
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, ntile(4) OVER w AS quartile,
        percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
      FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey)
      ORDER BY c_custkey"""))

  /** Value-based RANGE frame (reference `windowExpressions.scala:226`
    * SpecifiedWindowFrame/RangeFrame): peers by balance distance. */
  val qRange: QueryDef = QueryDef(
    "q37_window_range_frame",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT c_nationkey, c_custkey,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) OVER
            (PARTITION BY c_nationkey ORDER BY c_acctbal
             RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_balance,
          COUNT(*) OVER
            (PARTITION BY c_nationkey ORDER BY c_acctbal
             RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW) AS near_n
        FROM customer ORDER BY c_nationkey, c_custkey""")
    },
    Some("""
      SELECT c_nationkey, c_custkey,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) OVER
          (PARTITION BY c_nationkey ORDER BY c_acctbal
           RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_balance,
        COUNT(*) OVER
          (PARTITION BY c_nationkey ORDER BY c_acctbal
           RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW) AS near_n
      FROM customer ORDER BY c_nationkey, c_custkey"""))

  /** Sliding ROWS frame (moving average over last 5 orders per customer). */
  val qSliding: QueryDef = QueryDef(
    "q38_window_sliding",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey").rowsBetween(-4, 0)
      t(s, d, "orders")
        .select($"o_custkey", $"o_orderkey",
          (sum($"o_totalprice".cast(DecimalType(18, 6))).over(w)
            .cast(DoubleType) / count(lit(1)).over(w)).as("moving_avg"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
          / COUNT(*) OVER w AS moving_avg
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""))

  override def defs: Seq[QueryDef] = Seq(
    qRank, qRunning, qLeadLag, qNtile, qRange, qSliding)
}
