package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query receives `(spark, sfDir)`; this object is the single place
  * that maps logical table names to files and registers temp views so both
  * the DataFrame-DSL and `spark.sql` entry points see the same relations
  * (mirrors the reference's `SessionCatalog` role for our fixed schema,
  * reference `sql/catalyst/.../catalog/SessionCatalog.scala`).
  *
  * Scans stay fully declarative (`spark.read.parquet`) so Catalyst applies
  * partition pruning / filter pushdown / column pruning — at 100 TB these
  * tables would be directory-partitioned (e.g. lineitem by ship month) and
  * the same code path picks that up for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def df(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") eventsDf(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects (SPARK-40819). Read nanos as long (legacy conf) and
    * truncate to microseconds — the same truncation DuckDB applies — so the
    * engine-visible schema is a proper TimestampType column. */
  private def eventsDf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // `div` = integral division: nanos (~1.7e18) exceed 2^53, so a double
    // round-trip would drop up to ~128 ns before truncation. `div` alone
    // truncates toward zero, which rounds pre-1970 timestamps UP; subtract
    // the (always non-negative) pmod remainder first so the division is
    // exact — i.e. floor semantics, matching DuckDB's nanos→micros cast —
    // for any epoch sign.
    raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Register all tables as temp views for `spark.sql` queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
}
