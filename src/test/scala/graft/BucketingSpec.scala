package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CoverageExtras

/** Bucketed co-located join: both sides bucketed on the join key must plan
  * with ZERO shuffle exchanges (the 100 TB co-location pattern —
  * reference `EnsureRequirements`/`HashPartitioning` satisfaction).
  *
  * Broadcast joins are disabled for the duration of the test — at
  * sf0.001 both sides fit under the session's autoBroadcastJoinThreshold,
  * which would plan a BroadcastHashJoin and make the "no shuffle on the
  * join key" assertion vacuously true. Forcing the sort-merge path is
  * exactly what proves the exchange-free bucketed join. */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("bucketed sort-merge join plans without any ShuffleExchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE wraps the plan in AdaptiveSparkPlanExec/QueryStageExec, which
    // collect() does not traverse; it is not what this test checks, so pin
    // it off to keep the plan assertions direct.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = CoverageExtras.qBucketedJoin.run(spark, "/root/testdata/sf0.001")
      df.collect() // force planning + execution
      val plan = df.queryExecution.executedPlan
      val smj = plan.collectWithSubqueries { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected a SortMergeJoinExec, plan:\n$plan")
      val exchanges = plan.collectWithSubqueries {
        case e: ShuffleExchangeExec => e
      }
      // the only allowed exchanges are AFTER the join: the group-by on
      // o_orderpriority and the final sort. The join itself must consume the
      // bucketed layout directly, so at most 2 exchanges appear and none
      // partitions on the join key.
      assert(exchanges.size <= 2, s"unexpected exchanges: $exchanges")
      assert(!exchanges.exists(_.outputPartitioning.toString.contains("orderkey")),
        "join key shuffle found — bucket pruning failed")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
