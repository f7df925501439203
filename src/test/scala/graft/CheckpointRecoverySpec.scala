package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpointed streaming to a file sink survives a restart without
  * reprocessing (reference `StreamExecution` offset WAL /
  * `HDFSMetadataLog`): the second run finds no new input and must add
  * zero rows — exactly-once through the checkpoint. */
class CheckpointRecoverySpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("file-sink stream restart does not duplicate output") {
    val dir = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("graft_ckpt").toString
    val outPath = s"$base/out"
    val ckpt = s"$base/ckpt"

    def runOnce(): Unit = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$dir/events.parquet").schema
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .select(col("event_id"), col("event_type"))
      val q = stream.writeStream
        .format("parquet")
        .option("path", outPath)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    runOnce()
    val afterFirst = spark.read.parquet(outPath).count()
    runOnce() // same source, same checkpoint → no new batches
    val afterSecond = spark.read.parquet(outPath).count()

    val expected = Tables.df(spark, dir, "events").count()
    assert(afterFirst == expected)
    assert(afterSecond == expected, "restart must not reprocess committed offsets")
  }
}
