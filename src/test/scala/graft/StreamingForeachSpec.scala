package graft

import org.apache.spark.sql.{ForeachWriter, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Per-row streaming sink (reference `ForeachSink.scala` →
  * `DataStreamWriter.foreach(ForeachWriter)`): open/process/close runs on
  * executors per partition per epoch; results flow back through
  * accumulators (the executor→driver channel that survives any cluster
  * size). Also exercises Trigger.ProcessingTime — the reference's
  * `ProcessingTimeExecutor` (`TriggerExecutor.scala:35`) — where the
  * other streaming queries use AvailableNow/default. */
class StreamingForeachSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  test("ForeachWriter sees every row exactly once under ProcessingTime") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val expected = spark.read.parquet(s"$dir/events.parquet").count()

    val rowCount = spark.sparkContext.longAccumulator("graft_foreach_rows")
    val openCalls = spark.sparkContext.longAccumulator("graft_foreach_opens")
    val writer = new ForeachWriter[Row] {
      override def open(partitionId: Long, epochId: Long): Boolean = {
        openCalls.add(1); true
      }
      override def process(r: Row): Unit = {
        assert(r.getAs[String]("event_type") != null)
        rowCount.add(1)
      }
      override def close(errorOrNull: Throwable): Unit =
        assert(errorOrNull == null)
    }

    val q = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .select(col("event_type"), col("user_id"))
      .writeStream
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreach(writer)
      .start()
    try {
      q.processAllAvailable()
      assert(rowCount.value == expected,
        s"foreach saw ${rowCount.value} rows, batch has $expected")
      assert(openCalls.value > 0)
    } finally q.stop()
  }
}
