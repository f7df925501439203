package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{TopK, TopKPerKeyExec}

/** The custom TopKPerKey operator must agree with the window-function
  * formulation on every key, and its physical plan must contain the
  * two-phase (partial → final) exec pair. */
class TopKPerKeySpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  test("matches window row_number formulation on orders per customer") {
    import spark.implicits._
    val orders = Tables.df(spark, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")

    val viaCustom = TopK.perKey(orders,
      keys = Seq("o_custkey"),
      order = Seq(TopK.desc("o_totalprice"), TopK.asc("o_orderkey")), k = 3)
      .select($"o_custkey", $"o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).select($"o_custkey", $"o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(viaCustom == viaWindow)
    assert(viaCustom.nonEmpty)
  }

  test("plans as partial + final TopKPerKeyExec around one exchange") {
    import spark.implicits._
    val df = TopK.perKey(
      Tables.df(spark, dir, "orders").select($"o_custkey", $"o_totalprice"),
      Seq("o_custkey"), Seq(TopK.desc("o_totalprice")), 2)
    val execs = df.queryExecution.sparkPlan.collect {
      case e: TopKPerKeyExec => e.partial
    }
    assert(execs.sorted == Seq(false, true), s"got $execs")
  }

  test("partial-phase flush (tiny key budget) still yields exact top-k") {
    import spark.implicits._
    val orders = Tables.df(spark, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val viaFlush = TopK.perKey(orders, Seq("o_custkey"),
      Seq(TopK.desc("o_totalprice"), TopK.asc("o_orderkey")), 3,
      maxKeysInMemory = 8) // forces many flushes per partition
      .select($"o_custkey", $"o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaDefault = TopK.perKey(orders, Seq("o_custkey"),
      Seq(TopK.desc("o_totalprice"), TopK.asc("o_orderkey")), 3)
      .select($"o_custkey", $"o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaFlush == viaDefault)
  }

  test("k larger than group size returns whole groups") {
    import spark.implicits._
    val df = TopK.perKey(
      Tables.df(spark, dir, "region").select($"r_regionkey", $"r_name"),
      Seq("r_regionkey"), Seq(TopK.asc("r_name")), 10)
    assert(df.count() == 5)
  }
}
