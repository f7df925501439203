package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimization: `ANALYZE TABLE … COMPUTE STATISTICS FOR ALL
  * COLUMNS` feeds row counts + column NDV/min/max into Catalyst, and with
  * `spark.sql.cbo.enabled` + `joinReorder.enabled` the optimizer re-orders
  * a multi-way join by estimated cardinality instead of trusting the
  * query's textual order. This is the stats half of SURVEY §2.13's ANALYZE
  * row actually driving planning — at 100 TB a wrong first join is the
  * difference between an intermediate of 10⁶ and 10¹² rows.
  */
class CboReorderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.01"

  /** Leaf table names in join-tree order (left-deep walk). */
  private def joinLeaves(plan: LogicalPlan): Seq[String] = plan.collectLeaves()
    .flatMap(l => l.toString.linesIterator.take(1))
    .flatMap { s =>
      "cbo_(\\w+)".r.findFirstMatchIn(s).map(_.group(1))
    }

  /** Shared setup: saved + fully ANALYZEd copies of the three tables. */
  private lazy val tables: Unit = {
    for (t <- Seq("lineitem", "orders", "customer")) {
      spark.sql(s"DROP TABLE IF EXISTS cbo_$t")
      // a crashed session can leave the warehouse dir behind without its
      // catalog entry; CTAS refuses orphan locations, so clear it first
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), s"cbo_$t")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(loc, true)
      Tables.df(spark, dir, t).write.saveAsTable(s"cbo_$t")
      spark.sql(s"ANALYZE TABLE cbo_$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
  }

  test("ANALYZE column stats + cbo.joinReorder move the selective small " +
    "table first") {
    tables
    // Written order joins the two big facts FIRST; the filter makes
    // customer tiny, so a cost-based reorder should pull it earlier.
    val sql = """
      SELECT c.c_mktsegment, COUNT(*) AS n
      FROM cbo_lineitem l
      JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
      JOIN cbo_customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_acctbal > 9900.0
      GROUP BY c.c_mktsegment"""
    def leavesWith(cbo: Boolean): Seq[String] = {
      spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
      try joinLeaves(spark.sql(sql).queryExecution.optimizedPlan)
      finally {
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      }
    }
    val without = leavesWith(cbo = false)
    val withCbo = leavesWith(cbo = true)
    assert(without == Seq("lineitem", "orders", "customer"),
      s"baseline keeps written order, got $without")
    assert(withCbo != without,
      s"CBO should reorder the join, still got $withCbo")
    // The filtered customer table must join before the two facts meet.
    assert(withCbo.indexOf("customer") < 2,
      s"expected customer pulled forward, got $withCbo")

    // Reorder must not change the answer.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val on = spark.sql(sql).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    val off = spark.sql(sql).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(on == off)
    assert(on.values.sum > 0)
  }

  test("ANALYZE table stats are visible to the catalog (rowCount drives " +
    "the estimates)") {
    tables
    // plan stats carry rowCount only under CBO costing
    spark.conf.set("spark.sql.cbo.enabled", "true")
    val stats =
      try spark.table("cbo_customer").queryExecution.optimizedPlan.stats
      finally spark.conf.set("spark.sql.cbo.enabled", "false")
    assert(stats.rowCount.isDefined, "ANALYZE should pin an exact rowCount")
    assert(stats.rowCount.get.toLong ==
      Tables.df(spark, dir, "customer").count())
  }
}
