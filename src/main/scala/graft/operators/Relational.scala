package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.Exact._

/** Core batch-relational operator coverage (SURVEY.md §2.1-2.4, §2.6-2.7):
  * scan→filter→project, every join shape, hash aggregation (partial→final),
  * distinct/multi-distinct, sort, top-k fusion, set ops.
  *
  * All plans are declarative DataFrame DSL so Catalyst applies pushdown /
  * pruning / join selection (reference planner: `sql/core/.../execution/
  * SparkStrategies.scala:111-229` JoinSelection; ours is Spark 4's, plus
  * AQE). Scale notes per query are in Scaladoc — the driving rule: fact
  * tables (`lineitem`, `orders`) only ever shuffle on their join/group keys,
  * dimension tables broadcast.
  */
object Relational extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  /** TPC-H Q1-style pricing summary — scan+filter+hash-agg+sort.
    * At 100 TB: pure map-side-partial aggregation on 6 grouping states;
    * shuffle carries only |groups|×|aggs| rows. Filter pushed to parquet.
    */
  val q1PricingSummary: QueryDef = QueryDef(
    "q01_pricing_summary",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))
            .as("sum_charge"),
          avg($"l_quantity").as("avg_qty"),
          davg($"l_extendedprice").as("avg_price"),
          davg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        SUM(l_quantity) AS sum_qty,
        ${dsumSql("l_extendedprice")} AS sum_base_price,
        ${dsumSql("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price,
        ${dsumSql("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)")} AS sum_charge,
        AVG(l_quantity) AS avg_qty,
        ${davgSql("l_extendedprice")} AS avg_price,
        ${davgSql("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Filter+project with parquet pushdown — `.explain` must show
    * PushedFilters on p_size/p_brand and a 4-column ReadSchema. */
  val q2Filter: QueryDef = QueryDef(
    "q02_filter_project",
    (s, d) => {
      import s.implicits._
      t(s, d, "part")
        .filter($"p_size".between(10, 30) && $"p_type" === "PROMO")
        .select($"p_partkey", $"p_name", $"p_brand",
          ($"p_retailprice" * 1.1).as("marked_up"))
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey, p_name, p_brand, p_retailprice * 1.1 AS marked_up
      FROM part WHERE p_size BETWEEN 10 AND 30 AND p_type = 'PROMO'
      ORDER BY p_partkey"""))

  /** TPC-H Q3-style: dim-filter → fact joins → agg → top-k.
    * customer filtered then joined to orders (broadcastable dim at small SF;
    * at 100 TB orders⋈lineitem is the sort-merge/shuffled-hash pair on
    * orderkey and AQE picks the strategy), then TakeOrderedAndProject. */
  val q3ShippingPriority: QueryDef = QueryDef(
    "q03_shipping_priority",
    (s, d) => {
      import s.implicits._
      val cust = t(s, d, "customer").filter($"c_mktsegment" === "BUILDING")
      val ord = t(s, d, "orders").filter($"o_orderdate" < lit("1998-01-01").cast(TimestampType))
      val li = t(s, d, "lineitem").filter($"l_shipdate" > lit("1997-01-01").cast(TimestampType))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },
    Some(s"""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        ${dsumSql("l_extendedprice*(1.0-l_discount)")} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** Left-semi join (EXISTS): orders having a heavy line item.
    * Semi joins only carry the left side past the join — no row explosion. */
  val q4SemiJoin: QueryDef = QueryDef(
    "q04_semi_join_exists",
    (s, d) => {
      import s.implicits._
      val heavy = t(s, d, "lineitem").filter($"l_quantity" >= 48)
        .select($"l_orderkey")
      val ord = t(s, d, "orders")
      ord.join(heavy, ord("o_orderkey") === heavy("l_orderkey"), "left_semi")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** 6-way star join (TPC-H Q5-style): revenue by nation where customer and
    * supplier share the nation. nation/region broadcast; fact-side joins
    * shuffle on orderkey/suppkey only. */
  val q5LocalSupplier: QueryDef = QueryDef(
    "q05_local_supplier_volume",
    (s, d) => {
      import s.implicits._
      val li = t(s, d, "lineitem")
      val ord = t(s, d, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1998-01-01").cast(TimestampType))
      val cust = t(s, d, "customer")
      val supp = t(s, d, "supplier")
      val nat = t(s, d, "nation")
      val reg = t(s, d, "region").filter($"r_name" =!= "AFRICA")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(supp, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },
    Some(s"""
      SELECT n_name, ${dsumSql("l_extendedprice*(1.0-l_discount)")} AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND r_name <> 'AFRICA'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** TPC-H Q6: tight scalar aggregate — entirely map-side, zero shuffle
    * rows beyond one partial per partition. */
  val q6Forecast: QueryDef = QueryDef(
    "q06_forecast_revenue",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
          $"l_shipdate" < lit("1997-01-01").cast(TimestampType) &&
          $"l_discount".between(0.03, 0.07) && $"l_quantity" < 24)
        .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"))
    },
    Some(s"""
      SELECT ${dsumSql("l_extendedprice*l_discount")} AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"""))

  /** Left outer join + two-level aggregation (TPC-H Q13 customer
    * distribution). Outer joins preserve the unmatched left side; the
    * second agg groups on the derived count. */
  val q13CustDistribution: QueryDef = QueryDef(
    "q13_cust_order_distribution",
    (s, d) => {
      import s.implicits._
      val perCust = t(s, d, "customer")
        .join(t(s, d, "orders"), $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
      perCust.groupBy($"c_count").agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    },
    Some("""
      SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""))

  /** Full outer join of two aggregated sides + null-handling (NA fill). */
  val qFullOuter: QueryDef = QueryDef(
    "q14_full_outer_fill",
    (s, d) => {
      import s.implicits._
      val custPerNation = t(s, d, "customer").groupBy($"c_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val suppPerNation = t(s, d, "supplier").groupBy($"s_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      custPerNation.join(suppPerNation, Seq("nationkey"), "full_outer")
        .na.fill(0L, Seq("n_cust", "n_supp"))
        .orderBy($"nationkey")
    },
    Some("""
      SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
             COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
            FROM customer GROUP BY 1) c
      FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
            FROM supplier GROUP BY 1) s USING (nationkey)
      ORDER BY nationkey"""))

  /** Left-anti join (NOT EXISTS): customers who never ordered. */
  val qAntiJoin: QueryDef = QueryDef(
    "q15_anti_join",
    (s, d) => {
      import s.implicits._
      t(s, d, "customer")
        .join(t(s, d, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_never_ordered"))
        .orderBy($"c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_never_ordered
      FROM customer WHERE NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Cross join (cartesian) on two tiny dims — exercises
    * BroadcastNestedLoop/Cartesian planning; never do this on facts. */
  val qCross: QueryDef = QueryDef(
    "q16_cross_join",
    (s, d) => {
      import s.implicits._
      t(s, d, "nation").crossJoin(t(s, d, "region"))
        .select($"n_name", $"r_name")
        .orderBy($"n_name", $"r_name")
    },
    Some("SELECT n_name, r_name FROM nation CROSS JOIN region ORDER BY n_name, r_name"))

  /** Right outer join — planner flips to left-outer with sides swapped. */
  val qRightOuter: QueryDef = QueryDef(
    "q17_right_outer",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey", "right_outer")
        .groupBy($"c_mktsegment")
        .agg(count($"o_orderkey").as("n_orders"), count(lit(1)).as("n_rows"))
        .orderBy($"c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, COUNT(o_orderkey) AS n_orders, COUNT(*) AS n_rows
      FROM orders RIGHT OUTER JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Set ops: UNION (distinct), INTERSECT, EXCEPT — Catalyst rewrites the
    * latter two to semi/anti joins (reference `Optimizer.scala:1110,1131`). */
  val qUnion: QueryDef = QueryDef(
    "q18_set_union",
    (s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_nationkey".as("nationkey"))
        .union(t(s, d, "supplier").select($"s_nationkey".as("nationkey")))
        .distinct()
        .orderBy($"nationkey")
    },
    Some("""
      SELECT c_nationkey AS nationkey FROM customer
      UNION SELECT s_nationkey FROM supplier ORDER BY nationkey"""))

  val qIntersect: QueryDef = QueryDef(
    "q19_set_intersect",
    (s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_nationkey".as("nationkey"))
        .intersect(t(s, d, "supplier").select($"s_nationkey".as("nationkey")))
        .orderBy($"nationkey")
    },
    Some("""
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey"""))

  val qExcept: QueryDef = QueryDef(
    "q20_set_except",
    (s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_nationkey".as("nationkey"))
        .except(t(s, d, "supplier").select($"s_nationkey".as("nationkey")))
        .orderBy($"nationkey")
    },
    Some("""
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey"""))

  /** Top-k: orderBy+limit fuses into TakeOrderedAndProject (no global
    * sort; each partition keeps k rows, driver merges k·p rows). */
  val qTopK: QueryDef = QueryDef(
    "q21_topk_orders",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .limit(15)
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 15"""))

  /** Multi-distinct aggregation — planned via Expand (reference
    * `RewriteDistinctAggregates`); one shuffle per distinct-set group. */
  val qMultiDistinct: QueryDef = QueryDef(
    "q22_multi_distinct",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem").groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("nd_parts"),
          countDistinct($"l_suppkey").as("nd_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_parts,
             COUNT(DISTINCT l_suppkey) AS nd_supps, COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  override def defs: Seq[QueryDef] = Seq(
    q1PricingSummary, q2Filter, q3ShippingPriority, q4SemiJoin,
    q5LocalSupplier, q6Forecast, q13CustDistribution, qFullOuter,
    qAntiJoin, qCross, qRightOuter, qUnion, qIntersect, qExcept,
    qTopK, qMultiDistinct)
}
