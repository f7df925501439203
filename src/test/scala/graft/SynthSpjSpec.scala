package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Storage-partitioned join (`SupportsReportPartitioning` +
  * `HasPartitionKey`, SPARK-37377 — the DSv2 seam Iceberg bucket tables
  * use): two `clustered` synth scans joined/aggregated on `grp` plan
  * ZERO shuffle exchanges, and the result matches the shuffled plan
  * bit for bit.
  */
class SynthSpjSpec extends AnyFunSuite {

  lazy val spark = {
    val s = GraftSession.local(4)
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s
  }

  private def synth(rows: Int, clustered: Boolean): DataFrame =
    spark.read.format("graft-synth")
      .option("rows", rows).option("partitions", 4)
      .option("clustered", clustered).load()

  private def shuffles(df: DataFrame): Int = {
    df.collect() // finalize AQE
    def count(p: SparkPlan): Int =
      p.collectWithSubqueries {
        case _: ShuffleExchangeLike => 1
        case q: QueryStageExec => count(q.plan)
      }.sum
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      case p => count(p)
    }
  }

  /** Per-grp aggregate of each side, joined on grp — the co-located
    * star-shape. No orderBy: a global sort legitimately range-shuffles;
    * the seam under test is everything below it. */
  private def coGrouped(clustered: Boolean): DataFrame = {
    import spark.implicits._
    val a = synth(50000, clustered).groupBy($"grp")
      .agg(count(lit(1)).as("n_a"), sum($"id").as("sum_a"))
    val b = synth(20000, clustered).groupBy($"grp")
      .agg(count(lit(1)).as("n_b"))
    a.join(b, "grp").select($"grp", $"n_a", $"sum_a", $"n_b")
  }

  test("clustered scans join+aggregate on grp with zero shuffles; " +
    "result equals the shuffled plan") {
    // Force a real (non-broadcast) join so the co-location is what
    // removes the exchanges, not a broadcast of the small side.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val spj = coGrouped(clustered = true)
      val baseline = coGrouped(clustered = false)
      assert(shuffles(baseline) > 0,
        "unclustered baseline should need exchanges")
      assert(shuffles(spj) == 0,
        s"expected a fully co-located plan:\n${spj.queryExecution.executedPlan}")
      assert(spj.collect().sortBy(_.getLong(0)).toSeq ==
        baseline.collect().sortBy(_.getLong(0)).toSeq)
    } finally spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", (32L << 20).toString)
  }

  test("clustered scan pins one split per grp with its partition key") {
    val parts = new SynthScan(0L, 1000L, 4, SynthSource.schema,
      columnar = false, clustered = true).planInputPartitions()
    assert(parts.length == SynthScan.Groups)
    val keys = parts.collect { case g: SynthGrpPartition =>
      g.partitionKey().getLong(0) }
    assert(keys.toSeq == (0L until 100L))
    // residue-class slicing covers [lo, hi) exactly once
    val ids = parts.flatMap {
      case SynthGrpPartition(g, lo, hi) =>
        val first = lo + ((g - lo % 100 + 100) % 100)
        if (first >= hi) Seq.empty
        else (first until hi by 100).toSeq
    }
    assert(ids.sorted.toSeq == (0L until 1000L))
  }

  test("clustered scan with grp pruned away reports unknown partitioning " +
    "and still answers correctly") {
    import spark.implicits._
    // projection drops grp → partitioning must not be reported (Spark
    // resolves the key against the scan output) — query still correct.
    val n = synth(10000, clustered = true).select($"id")
      .filter($"id" >= 100 && $"id" < 4100).count()
    assert(n == 4000L)
  }
}
