package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Sink/source breadth past the memory sink the oracle queries use:
  * console sink (reference `sql/core/.../execution/streaming/console
  * .scala`), the rate source (`RateStreamProvider` — socket's
  * test-source sibling; a socket server needs a network peer the sandbox
  * does not provide), and the parquet file sink's `_spark_metadata`
  * commit log (reference `FileStreamSink.scala` — only committed files
  * are visible to readers). */
class StreamingSinksSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  test("console sink drains an AvailableNow query") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val q = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .select(col("event_type"))
      .writeStream.format("console").option("numRows", 3)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.exception.isEmpty)
    assert(q.recentProgress.nonEmpty)
  }

  test("rate source produces monotonically increasing rows") {
    val name = "graft_rate_smoke"
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", 50).load()
      .writeStream.format("memory").queryName(name).start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        n = spark.table(name).count()
      }
      assert(n > 0, "rate source produced no rows within 30s")
      val vals = spark.table(name)
        .select(col("value")).collect().map(_.getLong(0)).sorted
      assert(vals.distinct.length == vals.length, "rate values must be unique")
    } finally q.stop()
  }

  test("file sink readers list through the _spark_metadata commit log") {
    val base = java.nio.file.Files.createTempDirectory("graft_sinklog")
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val q = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .select(col("event_type"), col("value"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(new java.io.File(s"$out/_spark_metadata").exists(),
      "file sink must write its commit log")
    val committed = spark.read.parquet(out).count()
    assert(committed == spark.read.parquet(s"$dir/events.parquet").count())
    // An uncommitted file dropped into the directory is invisible to the
    // read path — the metadata log, not the listing, defines the table.
    spark.range(5).selectExpr("'zzz' AS event_type", "CAST(id AS DOUBLE) AS value")
      .write.mode("append").parquet(s"$base/stray")
    val stray = new java.io.File(s"$base/stray").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(stray.toPath,
      java.nio.file.Paths.get(s"$out/${stray.getName}"))
    assert(spark.read.parquet(out).count() == committed,
      "reader must ignore files outside the commit log")
  }
}
