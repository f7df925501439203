package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's queries. Each entry is one operator
  * from SURVEY.md §2's inventory (or a north-star LLM-pipeline operator);
  * oracle SQL runs in DuckDB over the same parquet tables.
  */
object SparkEntry {

  /** All operator modules, in SURVEY §2 order. */
  def modules: Seq[QueryModule] = Seq(
    graft.operators.Relational, graft.operators.Grouping,
    graft.operators.Windows, graft.operators.SqlSurface,
    graft.functions.ScalarFunctions, graft.operators.Dedup,
    graft.operators.Similarity, graft.functions.TextAnalysis,
    graft.operators.TypedOps, graft.sources.Sources,
    graft.streaming.StreamingOps, graft.operators.Multimodal,
    graft.operators.Workloads, graft.operators.CoverageExtras,
    graft.sources.JdbcSource, graft.functions.RegistrySweep,
    graft.operators.TpchStyle, graft.operators.EventAnalytics,
    graft.operators.Temporal, graft.operators.IterativeGraph,
    graft.operators.PipelineExtras, graft.operators.GraphExtras,
    graft.operators.TextPipeline, graft.operators.SurfaceExtras,
    graft.operators.ScalePatterns, graft.operators.CatalogPersistence,
    graft.operators.CorpusIngest, graft.operators.ModernSql,
    graft.operators.TpcdsShapes, graft.operators.Spark4Sql,
    graft.streaming.TransformWithStateOps, graft.functions.V2FunctionOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Relational.q1PricingSummary.run(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
