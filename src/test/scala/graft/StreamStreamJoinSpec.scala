package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream inner join with event-time range condition (absent in
  * the 2.1-era reference — Spark 4 parity bonus, SURVEY.md §2.9): clicks
  * join impressions within 10 minutes, both sides watermarked so join
  * state is bounded. */
class StreamStreamJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("stream-stream join matches within the time bound only") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val impressions = MemoryStream[(Int, Timestamp)]
    val clicks = MemoryStream[(Int, Timestamp)]
    val imp = impressions.toDF().toDF("ad", "imp_ts").withWatermark("imp_ts", "20 minutes")
    val clk = clicks.toDF().toDF("ad2", "clk_ts").withWatermark("clk_ts", "20 minutes")
    val joined = imp.join(clk,
      expr("""ad = ad2 AND clk_ts >= imp_ts AND
              clk_ts <= imp_ts + interval 10 minutes"""))
    val q = joined.writeStream.format("memory")
      .queryName("ss_join").outputMode("append").start()
    try {
      impressions.addData((1, ts(0)), (2, ts(0)))
      clicks.addData((1, ts(5)), (2, ts(25))) // ad2's click is too late
      q.processAllAvailable()
      // advance watermarks so results finalize
      impressions.addData((9, ts(59)))
      clicks.addData((9, ts(59)))
      q.processAllAvailable()
      val rows = spark.table("ss_join").collect()
      val matchedAds = rows.map(_.getAs[Int]("ad")).toSet
      assert(matchedAds.contains(1), "in-window click must join")
      assert(!matchedAds.contains(2), "out-of-window click must not join")
    } finally q.stop()
  }
}
