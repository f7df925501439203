package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Watermark semantics (reference `EventTimeWatermarkExec`,
  * `StatefulAggregate.scala:154-166` late-data eviction): replay a stream
  * with a late row and assert append-mode emission and eviction behavior.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("append mode emits only watermark-closed windows; late rows dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes"), $"k")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_test").start()
    try {
      // batch 1: two rows in the 10:00 window, one in 10:10
      input.addData((ts(1), "a"), (ts(4), "a"), (ts(12), "a"))
      q.processAllAvailable()
      // watermark now 10:12-5min = 10:07 → 10:00 window still open? No:
      // watermark passes 10:00+10min? 10:07 < 10:10 ⇒ nothing final yet.
      assert(spark.table("wm_test").count() == 0)

      // batch 2: advance event time to 10:21 → watermark 10:16 ≥ 10:10
      // ⇒ the 10:00 window closes and is emitted.
      input.addData((ts(21), "a"))
      q.processAllAvailable()
      val closed = spark.table("wm_test").collect()
      assert(closed.length == 1)
      assert(closed.head.getAs[Long]("n") == 2L)

      // batch 3: a LATE row for the already-closed 10:00 window → dropped.
      input.addData((ts(2), "a"), (ts(23), "a"))
      q.processAllAvailable()
      assert(spark.table("wm_test").count() == 1, "late row must not reopen window")
    } finally q.stop()
  }

  test("rate source produces rows under a processing-time trigger") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "50").load()
      .writeStream.format("memory").queryName("rate_smoke").start()
    try {
      Thread.sleep(1500)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("rate_smoke").columns.toSet == Set("timestamp", "value"))
    assert(spark.table("rate_smoke").count() > 0)
  }

  test("streaming query results match batch on events table") {
    val got = graft.streaming.StreamingOps.qDedup.run(spark, "/root/testdata/sf0.001")
      .collect().head.getLong(0)
    val want = Tables.df(spark, "/root/testdata/sf0.001", "events")
      .select("user_id").distinct().count()
    assert(got == want)
  }
}
