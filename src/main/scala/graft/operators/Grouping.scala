package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.Exact._

/** Grouping analytics (SURVEY.md §2.4): CUBE / ROLLUP / GROUPING SETS
  * (planned via Expand, reference `basicLogicalOperators.scala:606` +
  * `ExpandExec`), pivot, statistical aggregates, exact percentiles,
  * crosstab, NA replace.
  *
  * Scale note: Expand multiplies input rows by the number of grouping sets
  * *before* the shuffle, but partial aggregation collapses them map-side,
  * so the shuffle still carries only |groups| rows per partition.
  */
object Grouping extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  val qCube: QueryDef = QueryDef(
    "q23_cube",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(
          grouping($"o_orderstatus").as("g_status"),
          grouping($"o_orderpriority").as("g_prio"),
          count(lit(1)).as("n"),
          dsum($"o_totalprice").as("total"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    },
    Some(s"""
      SELECT o_orderstatus, o_orderpriority,
        GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_prio,
        COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  val qRollup: QueryDef = QueryDef(
    "q24_rollup",
    (s, d) => {
      import s.implicits._
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, d, "region")), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("balance"))
        .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
    },
    Some(s"""
      SELECT r_name, n_name, COUNT(*) AS n_cust, ${dsumSql("c_acctbal")} AS balance
      FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"""))

  /** GROUPING SETS via the SQL entry point (parser → ResolveGroupingAnalytics). */
  val qGroupingSets: QueryDef = QueryDef(
    "q25_grouping_sets",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT l_returnflag, l_linestatus,
          GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
          SUM(l_quantity) AS sum_qty, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
        SUM(l_quantity) AS sum_qty, COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** Pivot (reference `RelationalGroupedDataset.pivot` + `PivotFirst`):
    * explicit value list so no extra distinct-values job runs at scale. */
  val qPivot: QueryDef = QueryDef(
    "q26_pivot",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
        COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Moment-based stats. skew is computed from exact integer power sums with
    * the identical IEEE expression on both sides (sqrt, not pow — sqrt is
    * correctly rounded; libm pow is not guaranteed identical across engines). */
  val qStats: QueryDef = QueryDef(
    "q27_agg_stats",
    (s, d) => {
      import s.implicits._
      val q = $"l_quantity"
      val base = t(s, d, "lineitem").groupBy($"l_returnflag")
        .agg(
          count(lit(1)).cast(DoubleType).as("n"),
          sum(q).as("s1"), sum(q * q).as("s2"), sum(q * q * q).as("s3"),
          min(q).as("min_qty"), max(q).as("max_qty"),
          round(stddev_samp(q), 4).as("sd"),
          round(corr(q, $"l_extendedprice"), 6).as("corr_qp"))
      base.select(
        $"l_returnflag", $"min_qty", $"max_qty", $"sd", $"corr_qp",
        (($"s3" / $"n" - lit(3.0) * ($"s1" / $"n") * ($"s2" / $"n")
          + lit(2.0) * ($"s1" / $"n") * ($"s1" / $"n") * ($"s1" / $"n")) / {
          val v = $"s2" / $"n" - ($"s1" / $"n") * ($"s1" / $"n")
          sqrt(v * v * v) // x*x*x is exact IEEE; libm pow is not
        }).as("skew"))
        .withColumn("skew", round($"skew", 6))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag, min_qty, max_qty, sd, corr_qp,
        ROUND((s3/n - 3.0*(s1/n)*(s2/n) + 2.0*(s1/n)*(s1/n)*(s1/n))
          / SQRT((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))
                 * (s2/n - (s1/n)*(s1/n))), 6) AS skew
      FROM (
        SELECT l_returnflag,
          CAST(COUNT(*) AS DOUBLE) AS n,
          SUM(l_quantity) AS s1,
          SUM(l_quantity*l_quantity) AS s2,
          SUM(l_quantity*l_quantity*l_quantity) AS s3,
          MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
          ROUND(STDDEV_SAMP(l_quantity), 4) AS sd,
          ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qp
        FROM lineitem GROUP BY l_returnflag)
      ORDER BY l_returnflag"""))

  /** Exact percentiles (reference `Percentile` expression); dyadic
    * fractions keep the interpolation arithmetic identical across engines. */
  val qPercentile: QueryDef = QueryDef(
    "q28_percentile",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT l_linestatus,
          percentile(l_quantity, 0.25) AS p25,
          percentile(l_quantity, 0.5)  AS p50,
          percentile(l_quantity, 0.75) AS p75
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")
    },
    Some("""
      SELECT l_linestatus,
        quantile_cont(l_quantity, 0.25) AS p25,
        quantile_cont(l_quantity, 0.5)  AS p50,
        quantile_cont(l_quantity, 0.75) AS p75
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** Sketch aggregates (HLL++ / approx percentile, reference
    * `HyperLogLogPlusPlus.scala:54`): algorithm-specific outputs, so the
    * driver's rows-only check applies; the spec asserts error bounds. */
  val qApprox: QueryDef = QueryDef(
    "q29_approx_sketches",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem").groupBy($"l_returnflag")
        .agg(
          approx_count_distinct($"l_partkey").as("approx_parts"),
          percentile_approx($"l_quantity", lit(0.5), lit(1000)).as("approx_median"))
        .orderBy($"l_returnflag")
    },
    None)

  /** DataFrameStatFunctions.crosstab (reference `StatFunctions.scala`). */
  val qCrosstab: QueryDef = QueryDef(
    "q30_crosstab",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem").stat.crosstab("l_returnflag", "l_linestatus")
        .orderBy($"l_returnflag_l_linestatus")
    },
    Some("""
      SELECT l_returnflag AS l_returnflag_l_linestatus,
        COUNT(*) FILTER (WHERE l_linestatus = 'F') AS "F",
        COUNT(*) FILTER (WHERE l_linestatus = 'O') AS "O"
      FROM lineitem GROUP BY l_returnflag ORDER BY 1"""))

  /** DataFrameNaFunctions.replace (reference `DataFrameNaFunctions.scala:91`). */
  val qNaReplace: QueryDef = QueryDef(
    "q31_na_replace",
    (s, d) => {
      import s.implicits._
      t(s, d, "customer")
        .na.replace("c_mktsegment", Map("BUILDING" -> "BLDG", "MACHINERY" -> "MCHN"))
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy($"c_mktsegment")
    },
    Some("""
      SELECT CASE c_mktsegment WHEN 'BUILDING' THEN 'BLDG'
                               WHEN 'MACHINERY' THEN 'MCHN'
                               ELSE c_mktsegment END AS c_mktsegment,
             COUNT(*) AS n
      FROM customer GROUP BY 1 ORDER BY 1"""))

  /** Custom `TypedImperativeAggregate` (graft.functions.TopKLabels —
    * the reference's opaque-buffer aggregate interface,
    * `sql/catalyst/.../expressions/aggregate/interfaces.scala:463`):
    * top-3 customer names per segment by balance. The array result is
    * exploded to scalar rows and hash-checked against the row_number
    * formulation — proving the partial/merge/serialize paths produce
    * exactly the declarative answer. */
  val qTopKLabels: QueryDef = QueryDef(
    "q161_topk_labels_agg",
    (s, d) => {
      import s.implicits._
      t(s, d, "customer")
        .groupBy($"c_mktsegment")
        .agg(graft.functions.TopKAggregate
          .topKLabels($"c_acctbal", $"c_name", 3).as("labels"))
        .select($"c_mktsegment", posexplode($"labels"))
        .select($"c_mktsegment", ($"pos" + 1).cast("int").as("rnk"),
          $"col".as("c_name"))
        .orderBy($"c_mktsegment", $"rnk")
    },
    Some("""
      SELECT c_mktsegment, CAST(rnk AS INT) AS rnk, c_name
      FROM (SELECT c_mktsegment, c_name,
              row_number() OVER (PARTITION BY c_mktsegment
                                 ORDER BY c_acctbal DESC, c_name DESC) AS rnk
            FROM customer)
      WHERE rnk <= 3 ORDER BY c_mktsegment, rnk"""))

  override def defs: Seq[QueryDef] = Seq(
    qCube, qRollup, qGroupingSets, qPivot, qStats, qPercentile,
    qApprox, qCrosstab, qNaReplace, qTopKLabels)
}
