package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark 4 state-reader surface (`statestore` / `state-metadata` batch
  * sources over a Structured Streaming checkpoint) and the XML source's
  * entity round-trip — the pins behind q228/q230 beyond what the DuckDB
  * hash already proves.
  */
class StateReaderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  private def freshBase(name: String): Path = {
    val base = new Path(spark.conf.get("spark.sql.warehouse.dir"), name)
    base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(base, true)
    base
  }

  test("statestore read equals the sink's final state; state-metadata " +
      "describes the operator") {
    import spark.implicits._
    val base = freshBase("graft_statereader_spec")
    val ckpt = new Path(base, "ckpt").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = Tables.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("graft_sr_sink")
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()

    // Sink's last-update-per-key == store contents read from checkpoint.
    val sinkFinal = spark.table("graft_sr_sink")
      .groupBy($"event_type").agg(max($"n").as("n"))
      .as[(String, Long)].collect().toMap
    val state = spark.read.format("statestore").option("path", ckpt).load()
    val stateRows = state
      .select($"key.event_type", $"value.*")
      .toDF("event_type", "n")
      .as[(String, Long)].collect().toMap
    assert(stateRows == sinkFinal)

    // Keys spread across store partitions (the reader plans one split per
    // partition — this is what makes reading a 200-partition store scale).
    val parts = state.select($"partition_id").distinct().count()
    assert(parts >= 1)

    // state-metadata names the stateful operator and its store.
    val meta = spark.read.format("state-metadata").load(ckpt)
    val ops = meta.select($"operatorName").as[String].collect()
    assert(ops.contains("stateStoreSave"), s"operators: ${ops.toSeq}")
    val stores = meta.select($"stateStoreName").as[String].collect()
    assert(stores.contains("default"))
  }

  test("statestore batchId option reads a historical snapshot") {
    import spark.implicits._
    val base = freshBase("graft_statereader_hist")
    val ckpt = new Path(base, "ckpt").toString
    val in = new Path(base, "in").toString
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(in))

    def writeBatch(n: Int, tag: String): Unit =
      spark.range(n).select(lit(tag).as("k"))
        .coalesce(1).write.mode("append").parquet(in)
    def runOnce(): Unit = {
      // foreachBatch (not memory) so the SECOND run can recover from the
      // same checkpoint — that's what creates state history to read.
      val q = spark.readStream
        .schema("k STRING").parquet(in)
        .groupBy($"k").agg(count(lit(1)).as("n"))
        .writeStream.outputMode("update")
        .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
          { df.count(); () })
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeBatch(3, "a"); runOnce()   // batch 0: a→3
    writeBatch(5, "a"); runOnce()   // batch 1: a→8
    def stateAt(batch: Option[Long]): Map[String, Long] = {
      val r = spark.read.format("statestore").option("path", ckpt)
      batch.foreach(b => r.option("batchId", b.toString))
      r.load().select($"key.k", $"value.*").toDF("k", "n")
        .as[(String, Long)].collect().toMap
    }
    assert(stateAt(Some(0L)) == Map("a" -> 3L))
    assert(stateAt(None) == Map("a" -> 8L))
  }

  test("xml round-trip preserves entity-escaped characters") {
    import spark.implicits._
    val base = freshBase("graft_xml_escape")
    val path = new Path(base, "xml").toString
    val rows = Seq(
      (1L, "a < b & c > d"),
      (2L, "quote \" and 'tick'"),
      (3L, "plain")).toDF("id", "txt")
    rows.write.format("xml")
      .option("rootTag", "rows").option("rowTag", "row").save(path)
    val back = spark.read.format("xml").option("rowTag", "row").load(path)
      .select($"id", $"txt").as[(Long, String)].collect().toMap
    assert(back == rows.as[(Long, String)].collect().toMap)
  }
}
