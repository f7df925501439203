package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TransformWithStateOps.{BootstrappedTotalsProcessor, PerTypeCountProcessor, SessionGapProcessor, UserTotalsProcessor}

/** transformWithState semantics beyond q212's oracle row: named state
  * variables persist ACROSS micro-batches (the property that separates
  * stateful processing from per-batch aggregation), and MapState gives
  * per-sub-key state without packing maps into one value blob. Both run
  * under the RocksDB provider, which transformWithState requires. */
class TransformWithStateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val providerConf =
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("ValueState carries counts and exact sums across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Confs.withValues(spark, providerConf) {
      val input = MemoryStream[(Long, java.math.BigDecimal)]
      val out = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new UserTotalsProcessor, TimeMode.None(), OutputMode.Update)
        .toDF("user_id", "n", "total")
      val q = out.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("tws_batches").start()
      try {
        def dec(s: String) = new java.math.BigDecimal(s)
        input.addData((1L, dec("1.10")), (1L, dec("2.20")), (2L, dec("5.00")))
        q.processAllAvailable()
        input.addData((1L, dec("3.30")), (3L, dec("7.00")))
        q.processAllAvailable()
      } finally q.stop()

      val rows = spark.table("tws_batches")
        .groupBy($"user_id")
        .agg(max($"n").as("n"), expr("max_by(total, n)").as("total"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDecimal(2).stripTrailingZeros.toPlainString))
        .toMap
      // user 1 spans both batches: state resumed, not reset.
      assert(rows(1L) == (3L, "6.6"))
      assert(rows(2L) == (1L, "5"))
      assert(rows(3L) == (1L, "7"))
      // batch 1 emitted the intermediate (2, 3.30) row for user 1 —
      // proof the result above really accumulated across two batches.
      val interim = spark.table("tws_batches")
        .filter($"user_id" === 1L && $"n" === 2L).collect()
      assert(interim.length == 1)
      assert(interim.head.getDecimal(2).stripTrailingZeros.toPlainString == "3.3")
    }
  }

  test("MapState keeps independent per-sub-key counts under one grouping key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Confs.withValues(spark, providerConf) {
      val input = MemoryStream[(Long, String)]
      val out = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new PerTypeCountProcessor, TimeMode.None(), OutputMode.Update)
        .toDF("user_id", "etype", "n")
      val q = out.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("tws_map").start()
      try {
        input.addData((1L, "click"), (1L, "view"), (1L, "click"), (2L, "view"))
        q.processAllAvailable()
        input.addData((1L, "click"), (2L, "view"), (2L, "buy"))
        q.processAllAvailable()
      } finally q.stop()

      val finalCounts = spark.table("tws_map")
        .groupBy($"user_id", $"etype").agg(max($"n").as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(finalCounts == Map(
        (1L, "click") -> 3L, (1L, "view") -> 1L,
        (2L, "view") -> 2L, (2L, "buy") -> 1L))
    }
  }

  test("event-time timer closes a gap session when the watermark passes it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Confs.withValues(spark, providerConf) {
      val input = MemoryStream[(Long, java.sql.Timestamp)]
      val out = input.toDS().toDF("user", "ts")
        .withWatermark("ts", "10 seconds")
        .as[(Long, java.sql.Timestamp)]
        .groupByKey(_._1)
        .transformWithState(new SessionGapProcessor(60000L),
          TimeMode.EventTime(), OutputMode.Append)
        .toDF("user", "n", "dur_ms")
      val q = out.writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("tws_session").start()
      try {
        // user 1's session: two events 5 s apart.
        input.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:00:05")))
        q.processAllAvailable()
        assert(spark.table("tws_session").isEmpty, "session still open")
        // user 2 five minutes later pushes the watermark far past user 1's
        // gap timeout; the watermark update lands next batch, so a third
        // batch lets the timer fire.
        input.addData((2L, ts("2024-01-01 10:05:00")))
        q.processAllAvailable()
        input.addData((2L, ts("2024-01-01 10:05:01")))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("tws_session").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // user 1 closed with both events; user 2's session is still open.
      assert(rows.toSeq == Seq((1L, 2L, 5000L)))
    }
  }

  test("initial state seeds keys from a batch Dataset; unseeded keys start cold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def dec(s: String) = new java.math.BigDecimal(s)
    Confs.withValues(spark, providerConf) {
      // The historical snapshot a migration would read from parquet.
      val seed = Seq((1L, (2L, dec("10.00"))), (5L, (7L, dec("70.00"))))
        .toDS().groupByKey(_._1).mapValues(_._2)
      val input = MemoryStream[(Long, java.math.BigDecimal)]
      val out = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new BootstrappedTotalsProcessor,
          TimeMode.None(), OutputMode.Update, seed)
        .toDF("user_id", "n", "total")
      val q = out.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("tws_boot").start()
      try {
        input.addData((1L, dec("5.00")), (9L, dec("1.00")))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("tws_boot").collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getDecimal(2).stripTrailingZeros.toPlainString)).toMap
      // user 1 resumed from the seeded (2, 10.00); user 9 started cold.
      assert(rows(1L) == (3L, "15"))
      assert(rows(9L) == (1L, "1"))
      // user 5 was seeded but saw no input ⇒ no emission this batch.
      assert(!rows.contains(5L))
    }
  }
}
