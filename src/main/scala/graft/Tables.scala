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

  /** Normalize `events.ts` across testdata generations so every consumer
    * (batch, streaming, tests) sees one engine-visible type: session-tz
    * `TimestampType`, microsecond precision.
    *
    *   - `LongType`: raw nanos from the legacy `nanosAsLong` read of older
    *     TIMESTAMP(NANOS) files (Spark's vectorized reader rejects nanos,
    *     SPARK-40819). Truncate to micros with floor semantics: `div`
    *     alone truncates toward zero, which rounds pre-1970 timestamps UP;
    *     subtracting the (always non-negative) pmod remainder first makes
    *     the division exact for any epoch sign — matching DuckDB's
    *     nanos→micros cast.
    *   - `TimestampNTZType`: current testdata writes plain `timestamp[us]`
    *     (no UTC adjustment), which Spark reads as TIMESTAMP_NTZ. Cast to
    *     TimestampType — value-identical under the engine's pinned UTC
    *     session zone, and what DuckDB sees as naive micros.
    *   - already `TimestampType`: pass through.
    *
    * Works on batch and streaming frames alike (pure column expressions). */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  private def eventsDf(spark: SparkSession, dir: String): DataFrame = {
    // Harmless on current micros files; lets older nanos files load as long.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Register all tables as temp views for `spark.sql` queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
}
