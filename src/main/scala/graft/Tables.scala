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
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views for `spark.sql` queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
}
