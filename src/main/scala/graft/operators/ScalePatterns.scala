package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.Exact._

/** 100 TB operational patterns as first-class, oracle-checked operators:
  * bloom-filter semi-join pruning, dynamic partition overwrite, salted
  * skew joins, and foreachBatch/AvailableNow streaming upserts. Each is
  * EXACT despite being an "approximate-era" technique — the bloom filter
  * only pre-prunes before a real join, the salt is dropped after the
  * join, the upsert converges to the batch answer — which is the point:
  * these patterns change the execution shape, never the result.
  */
object ScalePatterns extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  /** Bloom-filter join pruning (reference `common/sketch/.../BloomFilter
    * .java`, exposed via `DataFrameStatFunctions`): build a bloom filter
    * over the selective dim keys, broadcast it, and drop fact rows
    * map-side BEFORE the join shuffle — at 100 TB this cuts the shuffle
    * by the dim's selectivity at the cost of one small scan. False
    * positives only let extra rows into the exchange; the real join
    * removes them, so the result (and the oracle) is the plain join. */
  val qBloomPrune: QueryDef = QueryDef(
    "q157_bloom_join_prune",
    (s, d) => {
      import s.implicits._
      val dim = t(s, d, "customer")
        .filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey")
      val bloom = dim.stat.bloomFilter("c_custkey",
        expectedNumItems = 100000L, fpp = 0.01)
      val bc = s.sparkContext.broadcast(bloom)
      val mightContain = udf((k: Long) => bc.value.mightContain(k))
      t(s, d, "orders")
        .filter(mightContain($"o_custkey"))   // map-side pre-prune
        .join(dim, $"o_custkey" === $"c_custkey") // exact semi filter
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("volume"))
        .orderBy($"o_orderpriority")
    },
    Some(s"""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
             ${dsumSql("o_totalprice")} AS volume
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Dynamic partition overwrite (`spark.sql.sources.partitionOverwrite
    * Mode=dynamic`): rewrite ONLY the partitions present in the incoming
    * batch — the idempotent-backfill primitive for partitioned 100 TB
    * tables (static mode would wipe every other partition). Here the
    * 1-URGENT partition is replaced by its >100k subset; all other
    * partitions must survive untouched. */
  val qDynamicOverwrite: QueryDef = QueryDef(
    "q159_dynamic_partition_overwrite",
    (s, d) => {
      import s.implicits._
      val prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      val path = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"),
        s"graft_dynpart_${d.replaceAll("[^A-Za-z0-9]", "_")}").toString
      try {
        val cols = Seq($"o_orderkey", $"o_totalprice", $"o_orderpriority")
        t(s, d, "orders").select(cols: _*)
          .write.mode(SaveMode.Overwrite)
          .partitionBy("o_orderpriority").parquet(path)
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        t(s, d, "orders").select(cols: _*)
          .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 100000.0)
          .write.mode(SaveMode.Overwrite)
          .partitionBy("o_orderpriority").parquet(path)
        s.read.parquet(path)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("volume"))
          .orderBy($"o_orderpriority")
      } finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    },
    Some(s"""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             ${dsumSql("o_totalprice")} AS volume
      FROM orders
      WHERE o_orderpriority <> '1-URGENT' OR o_totalprice > 100000.0
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Salted skew join as a query: orders (big, salted by orderkey) joined
    * to nation-priority weights (small, exploded ×8). The salt changes
    * only which reducer each hot key's rows land on; the oracle is the
    * plain join. */
  val qSaltedJoin: QueryDef = QueryDef(
    "q160_salted_skew_join",
    (s, d) => {
      import s.implicits._
      val weights = t(s, d, "orders").select($"o_orderpriority").distinct()
        .withColumn("w", length($"o_orderpriority").cast("long"))
        .withColumnRenamed("o_orderpriority", "p")
      graft.api.Graft.saltedJoin(
          t(s, d, "orders"), weights,
          bigKey = "o_orderpriority", smallKey = "p",
          saltCol = "o_orderkey", saltFactor = 8)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), sum($"w").cast("long").as("wsum"))
        .orderBy($"o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len(o_orderpriority)) AS BIGINT) AS wsum
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** foreachBatch + Trigger.AvailableNow: the incremental-upsert sink
    * shape (MERGE INTO a serving store per micro-batch, then stop when
    * caught up). Update-mode batches carry only changed keys; the upsert
    * map converges to exactly the batch group-by. */
  val qForeachBatchUpsert: QueryDef = QueryDef(
    "q158_stream_foreachbatch_upsert",
    (s, d) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val counts = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .groupBy($"event_type").agg(count(lit(1)).as("n"))
      val acc = new scala.collection.concurrent.TrieMap[String, Long]
      val upsert: (Dataset[Row], Long) => Unit = (batch, _) =>
        batch.collect().foreach { r =>
          acc.update(r.getAs[String]("event_type"), r.getAs[Long]("n"))
        }
      val q = counts.writeStream.outputMode("update")
        .trigger(Trigger.AvailableNow())
        .foreachBatch(upsert).start()
      q.awaitTermination()
      s.createDataFrame(acc.toSeq).toDF("event_type", "n")
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  override def defs: Seq[QueryDef] =
    Seq(qBloomPrune, qForeachBatchUpsert, qDynamicOverwrite, qSaltedJoin)
}
