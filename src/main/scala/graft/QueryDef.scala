package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-coverage query: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent ANSI SQL string the driver
  * runs in DuckDB over the same parquet tables. `oracle = None` downgrades
  * to the driver's rows-only check (used for sketch/LSH/graph ops whose
  * exact output SQL cannot reproduce).
  *
  * Invariant (driver contract): output column names match between `run`'s
  * DataFrame and the oracle SQL — the compare sorts columns by name.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap
  final def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
