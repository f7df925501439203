package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark-2.1-parity semantics (SURVEY.md §7.1): the session pins
  * non-ANSI (permissive) behavior — bad casts yield null, arithmetic
  * overflow wraps — matching the reference's `Cast.scala` and the DuckDB
  * oracle expectations encoded in the correctness gate. Plus the salted
  * join equivalence. */
class SemanticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  test("permissive casts: malformed strings cast to null, not error") {
    import spark.implicits._
    val r = spark.sql(
      "SELECT CAST('abc' AS INT) AS a, CAST('12x' AS DOUBLE) AS b, CAST('7' AS INT) AS c")
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getInt(2) == 7)
  }

  test("integer overflow wraps (non-ANSI)") {
    val r = spark.sql("SELECT CAST(2147483647 AS INT) + CAST(1 AS INT) AS v")
      .collect()(0)
    assert(r.getInt(0) == Int.MinValue)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val orders = Tables.df(spark, dir, "orders")
    val cust = Tables.df(spark, dir, "customer")
    val plain = orders.join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = graft.api.Graft.saltedJoin(
      orders, cust, "o_custkey", "c_custkey", saltCol = "o_orderkey")
      .groupBy($"c_mktsegment").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }
}
