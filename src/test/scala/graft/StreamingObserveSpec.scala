package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Exact.dsum

/** `observe()` wired into Structured Streaming — the SLO-counter pattern
  * end to end (extends q197's batch observe): named accumulator metrics
  * ride each micro-batch with zero extra jobs, surface per batch in
  * `StreamingQueryProgress.observedMetrics`, and a
  * `StreamingQueryListener` collects them. The per-batch rows/sums must
  * add up to exactly what a batch pass over the same input computes —
  * the invariant an ingest-pipeline SLO counter rests on. */
class StreamingObserveSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  private val sfDir = "/root/testdata/sf0.001"

  test("per-batch observed metrics sum to the batch oracle totals") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema

    val perBatch = ArrayBuffer[(Long, Long, Double)]() // batchId, rows, total
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics.get("ingest")
        if (m != null) // no-data micro-batches carry no observed metrics
          perBatch.synchronized {
            perBatch += ((e.progress.batchId,
              m.getAs[Long]("rows"), m.getAs[Double]("total_value")))
          }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val src = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
        .observe("ingest",
          count(lit(1)).as("rows"),
          dsum($"value").as("total_value"))
      val q = src.groupBy($"event_type").agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete")
        .format("memory").queryName("graft_obs_stream").start()
      try q.processAllAvailable() finally q.stop()
      // progress events arrive on the async listener bus
      Drain.untilStable(perBatch.synchronized(perBatch.size).toLong)

      val batch = spark.read.parquet(s"$sfDir/events.parquet")
      val expectRows = batch.count()
      val expectTotal = batch.agg(dsum($"value")).head().getDouble(0)
      val seen = perBatch.synchronized(perBatch.toSeq)
      assert(seen.nonEmpty, "no observed metrics reached the listener")
      assert(seen.map(_._1).distinct.size == seen.size,
        s"duplicate batch ids in $seen")
      assert(seen.map(_._2).sum == expectRows,
        s"observed rows ${seen.map(_._2).sum} != batch $expectRows ($seen)")
      // each batch's total is an exact decimal sum; across batches the
      // double addition is exact here (money-scale magnitudes)
      assert(math.abs(seen.map(_._3).sum - expectTotal) < 1e-6,
        s"observed total ${seen.map(_._3).sum} != batch $expectTotal")
    } finally spark.streams.removeListener(listener)
  }
}
