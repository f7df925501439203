package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime re-planning evidence — the engine's 100 TB posture is AQE
  * (GraftSession turns it on), so pin that it actually engages:
  * partition coalescing rewrites the shuffle read, skew-join splitting
  * splits an oversized partition, and reliable checkpointing truncates
  * lineage (the long-iteration safety valve localCheckpoint approximates
  * in q142). Reference counterpart: the experimental
  * `ExchangeCoordinator` (`sql/core/.../exchange/ExchangeCoordinator
  * .scala`) — AQE is its finished replacement. */
class AdaptiveExecSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, shufflePartitions = 32)
  private val dir = "/root/testdata/sf0.001"

  test("AQE coalesces empty-ish shuffle partitions at runtime") {
    import spark.implicits._
    val df = Tables.df(spark, dir, "nation")
      .groupBy($"n_regionkey").agg(count(lit(1)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead"), plan.take(400))
    assert(plan.contains("coalesced"), plan.take(400))
  }

  test("AQE splits a skewed join partition when thresholds are crossed") {
    import spark.implicits._
    val prev = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.coalescePartitions.enabled" ->
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // 50k rows of key 0 vs 100 spread keys: partition holding key 0
      // dwarfs the others and crosses the 16KB threshold.
      val skewed = spark.range(0, 50000).select(lit(0L).as("k"), $"id")
        .union(spark.range(1, 101).select($"id".as("k"), $"id"))
      val right = spark.range(0, 101).select($"id".as("k"),
        ($"id" * 2).as("v"))
      val joined = skewed.join(right, "k")
      joined.collect() // drive this execution so the adaptive plan is final
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(800))
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("reliable checkpoint truncates lineage to an RDD scan") {
    import spark.implicits._
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    val df = Tables.df(spark, dir, "region")
      .groupBy($"r_regionkey").agg(count(lit(1)).as("n"))
    val cp = df.checkpoint()
    assert(cp.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
      "checkpoint must replace the plan with the materialized RDD")
    assert(cp.count() == df.count())
  }
}
