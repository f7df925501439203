package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins `Tables.normalizeEventTs` across every `events.ts` physical
  * encoding the testdata generator has shipped (the seam that broke a
  * whole round when the driver regenerated the files):
  *
  *   1. raw nanos as `long` — the legacy `nanosAsLong` read of old
  *      TIMESTAMP(NANOS) files,
  *   2. `TIMESTAMP_NTZ` — the current `timestamp[us]` files (no UTC
  *      adjustment flag, Spark's NTZ inference on),
  *   3. session-tz `TimestampType` — already normalized.
  *
  * All three must normalize to the SAME TimestampType micros — including
  * a pre-1970 instant, where naive `div` truncation of negative nanos
  * would round toward zero instead of flooring. */
class EventTsNormalizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(2)

  // one post-1970 instant with sub-micro nanos residue, one pre-1970
  private val microsValues = Seq(1700000000123456L, -123456789L)
  private val nanosValues = microsValues.map(m => m * 1000L + 789L)

  private def normalizedMicros(df: DataFrame): Seq[Long] = {
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType == TimestampType,
      s"normalize must yield TimestampType, got ${out.schema("ts").dataType}")
    out.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("long nanos, TIMESTAMP_NTZ, and TimestampType all normalize to " +
    "identical session-tz micros (floor semantics pre-1970)") {
    import spark.implicits._
    val asLong = nanosValues.toDF("ts")
    val asTz = microsValues.toDF("us").select(timestamp_micros($"us").as("ts"))
    val asNtz = asTz.select($"ts".cast(TimestampNTZType).as("ts"))
    assert(asNtz.schema("ts").dataType == TimestampNTZType)

    val expected = microsValues.sorted
    assert(normalizedMicros(asLong) == expected, "long-nanos branch")
    assert(normalizedMicros(asNtz) == expected, "NTZ branch")
    assert(normalizedMicros(asTz) == expected, "TimestampType branch")
  }

  test("normalize applies to a streaming relation (current NTZ files)") {
    val dir = Files.createTempDirectory("graft_ts_norm").toString
    import spark.implicits._
    microsValues.toDF("us")
      .select(timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(dir))
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == TimestampType)
    val q = stream.select(unix_micros(col("ts")).as("us"))
      .writeStream.format("memory").queryName("graft_ts_norm").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("graft_ts_norm")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got == microsValues.sorted)
  }

  test("the real events table reads as TimestampType at every checked-in sf") {
    Seq("sf0.001", "sf0.01").foreach { sf =>
      val df = Tables.df(spark, s"/root/testdata/$sf", "events")
      assert(df.schema("ts").dataType == TimestampType, sf)
      assert(df.limit(1).count() == 1, sf)
    }
  }
}
