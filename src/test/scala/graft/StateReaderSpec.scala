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

  test("statestore reads a transformWithState named ValueState by name") {
    import spark.implicits._
    val base = freshBase("graft_statereader_tws")
    val ckpt = new Path(base, "ckpt").toString
    val in = new Path(base, "in").toString
    base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(new Path(in))
    (Seq.fill(3)("a") ++ Seq.fill(5)("b")).toDF("k")
      .coalesce(1).write.mode("append").parquet(in)

    class CountProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, org.apache.spark.sql.Row, (String, Long)] {
      @transient private var n: org.apache.spark.sql.streaming.ValueState[Long] = _
      override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
          timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
        n = getHandle.getValueState[Long]("n",
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.streaming.TTLConfig.NONE)
      override def handleInputRows(key: String,
          rows: Iterator[org.apache.spark.sql.Row],
          timerValues: org.apache.spark.sql.streaming.TimerValues)
          : Iterator[(String, Long)] = {
        val total = (if (n.exists()) n.get() else 0L) + rows.size
        n.update(total)
        Iterator.single((key, total))
      }
    }

    Confs.withValues(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val q = spark.readStream.schema("k STRING").parquet(in)
        .groupByKey(_.getString(0))
        .transformWithState(new CountProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
        .toDF("k", "n")
        .writeStream.outputMode("update")
        .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
          { df.count(); () })
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      // The named state variable is addressed directly — the reader
      // surface that makes TWS state debuggable/migratable per variable.
      val state = spark.read.format("statestore")
        .option("path", ckpt).option("stateVarName", "n").load()
      val rows = state.selectExpr("key.value AS k", "value.value AS n")
        .as[(String, Long)].collect().toMap
      assert(rows == Map("a" -> 3L, "b" -> 5L), s"got $rows")
    }
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
