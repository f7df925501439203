package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic-aggregation helpers.
  *
  * Distributed double summation is order-dependent (partial aggregation runs
  * per-partition, reference `sql/core/.../aggregate/AggUtils.scala` plans
  * partial→final), so `sum(double)` can drift in the last ulp between runs
  * and between engines. For oracle-checked money aggregates we round each
  * addend to a fixed scale and sum *exactly* in decimal — associative, so
  * partial aggregation and AQE re-planning cannot change the result — then
  * present as double. Identical SQL (`CAST(SUM(CAST(x AS DECIMAL(18,s))) AS
  * DOUBLE)`) reproduces it bit-for-bit in DuckDB.
  *
  * This is not a test-only trick: at 100 TB exact decimal aggregation is how
  * you get run-to-run reproducible financial rollups regardless of partition
  * count; Tungsten sums decimals on unsafe rows with no boxing.
  */
object Exact {
  /** Order-independent sum of a double expression at fixed decimal scale. */
  def dsum(e: Column, scale: Int = 6): Column =
    sum(e.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Order-independent mean: exact decimal sum / count, divided as double. */
  def davg(e: Column, scale: Int = 6): Column =
    dsum(e, scale) / count(lit(1))

  /** SQL fragment mirrors (for DuckDB oracle strings). */
  def dsumSql(e: String, scale: Int = 6): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE)"
  def davgSql(e: String, scale: Int = 6): String =
    s"(${dsumSql(e, scale)} / COUNT(*))"
}
