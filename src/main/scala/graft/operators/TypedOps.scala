package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}

/** Typed Dataset / UDx surface (SURVEY.md §2.2, §2.10): encoders,
  * `groupByKey.mapGroups`, `mapPartitions`, `flatMap`, a custom
  * `Aggregator` registered through `functions.udaf` (the Spark-4
  * replacement for the reference's deprecated
  * `UserDefinedAggregateFunction`, `sql/core/.../expressions/udaf.scala:32`),
  * and a registered scalar Scala UDF.
  *
  * Scale note: typed lambdas deserialize rows into JVM objects — fine for
  * the operators below (group cardinality bounded, pure per-row maps), but
  * the relational modules deliberately avoid them on hot paths; this module
  * exists because the reference's Dataset API is part of the surface.
  */
object TypedOps extends QueryModule {

  case class Li(l_orderkey: Long, l_quantity: Double, l_returnflag: String,
      l_linestatus: String)
  case class Cust(c_custkey: Long, c_name: String, c_acctbal: Double,
      c_mktsegment: String)

  /** Sum of integral quantities as long — order-independent. */
  private object QtyAgg extends Aggregator[Double, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Double): Long = b + a.toLong
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  val qMapGroups: QueryDef = QueryDef(
    "q80_typed_mapgroups",
    (s, d) => {
      import s.implicits._
      Tables.df(s, d, "lineitem")
        .select($"l_orderkey", $"l_quantity", $"l_returnflag", $"l_linestatus")
        .as[Li]
        .groupByKey(_.l_returnflag)
        .mapGroups((flag, rows) => (flag, rows.map(_.l_quantity.toLong).sum))
        .toDF("l_returnflag", "total_qty")
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val qAggregator: QueryDef = QueryDef(
    "q81_typed_aggregator",
    (s, d) => {
      import s.implicits._
      val qtySum = udaf(QtyAgg)
      Tables.df(s, d, "lineitem")
        .groupBy($"l_linestatus")
        .agg(qtySum($"l_quantity").as("total_qty"))
        .orderBy($"l_linestatus")
    },
    Some("""
      SELECT l_linestatus, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** Scalar Scala UDF registered for SQL use (reference `ScalaUDF`,
    * `UDFRegistration`). Codegen-opaque — acceptable off the hot path. */
  val qUdf: QueryDef = QueryDef(
    "q82_udf_scalar",
    (s, d) => {
      Tables.registerAll(s, d)
      s.udf.register("cust_num", (name: String) => name.split("#")(1).toLong)
      s.sql("""
        SELECT c_mktsegment, CAST(SUM(cust_num(c_name)) AS BIGINT) AS id_sum
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },
    Some("""
      SELECT c_mktsegment,
        CAST(SUM(CAST(string_split(c_name, '#')[2] AS BIGINT)) AS BIGINT) AS id_sum
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Per-partition imperative pass (reference `MapPartitionsExec`,
    * `objects.scala`) — pure per-row function, so oracle-expressible. */
  val qMapPartitions: QueryDef = QueryDef(
    "q83_typed_mappartitions",
    (s, d) => {
      import s.implicits._
      Tables.df(s, d, "customer")
        .select($"c_custkey", $"c_name", $"c_acctbal", $"c_mktsegment")
        .as[Cust]
        .mapPartitions(rows => rows.map(c =>
          (c.c_custkey, c.c_mktsegment.length.toLong, math.floor(c.c_acctbal).toLong)))
        .toDF("c_custkey", "seg_len", "bal_floor")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, CAST(length(c_mktsegment) AS BIGINT) AS seg_len,
        CAST(floor(c_acctbal) AS BIGINT) AS bal_floor
      FROM customer ORDER BY c_custkey"""))

  val qFlatMap: QueryDef = QueryDef(
    "q84_typed_flatmap",
    (s, d) => {
      import s.implicits._
      Tables.df(s, d, "documents").select($"text").as[String]
        .flatMap(_.split(" "))
        .filter(w => w.length > 5)
        .groupByKey(identity).count()
        .toDF("word", "n")
        .orderBy($"n".desc, $"word")
        .limit(10)
    },
    Some("""
      SELECT word, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE length(word) > 5
      GROUP BY word ORDER BY n DESC, word LIMIT 10"""))

  /** Typed `cogroup` (reference `CoGroupExec`,
    * `sql/core/.../execution/objects.scala:66` — both inputs hash-shuffled
    * on the key, then a single per-key merge function over the two sorted
    * iterators): per-order custom reconciliation of the order row against
    * its lineitems. Exactness note: prices are recovered to their true
    * decimal (`setScale(6)` of the nearest double) and summed as
    * `BigDecimal`, so the merge result is independent of iterator order —
    * the property that makes an imperative cogroup hash-matchable against
    * a SQL join+group oracle. */
  val qCogroup: QueryDef = QueryDef(
    "q167_typed_cogroup",
    (s, d) => {
      import s.implicits._
      val orders = Tables.df(s, d, "orders")
        .filter($"o_orderkey" < 2000)
        .select($"o_orderkey".cast("long"), $"o_totalprice".cast("double"))
        .as[(Long, Double)]
      val items = Tables.df(s, d, "lineitem")
        .filter($"l_orderkey" < 2000)
        .select($"l_orderkey".cast("long"), $"l_extendedprice".cast("double"))
        .as[(Long, Double)]
      orders.groupByKey(_._1).cogroup(items.groupByKey(_._1)) {
        (key, os, ls) =>
          val o = os.toList
          if (o.isEmpty) Iterator.empty // lineitems with no order row
          else {
            var n = 0L
            var rev = BigDecimal(0)
            ls.foreach { l =>
              n += 1
              rev += BigDecimal(l._2).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            }
            Iterator((key, o.head._2, n, rev.toDouble))
          }
      }.toDF("o_orderkey", "o_totalprice", "n_items", "revenue")
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_totalprice,
             CAST(COUNT(l_orderkey) AS BIGINT) AS n_items,
             COALESCE(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                           AS DOUBLE), 0.0) AS revenue
      FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_orderkey < 2000
      GROUP BY o_orderkey, o_totalprice ORDER BY o_orderkey"""))

  override def defs: Seq[QueryDef] = Seq(
    qMapGroups, qAggregator, qUdf, qMapPartitions, qFlatMap, qCogroup)
}
