package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Z-order (Morton) clustering value for multi-dimensional data skipping.
  *
  * A single-column sort gives a compacted table disjoint per-file stats on
  * ONE column; predicates on any other column still open every file. The
  * z-value interleaves the bits of several columns' equi-depth bucket
  * indexes, so sorting by it tiles the key space into hyper-rectangles:
  * every file's min/max box is tight in EVERY clustering dimension and a
  * selective predicate on any one of them skips most files (the
  * rewrite-with-z-order Iceberg/Delta ship for the same reason; the 2.1
  * reference has no analogue — its pruning stops at directory partitions,
  * `sql/core/.../PruneFileSourcePartitions`).
  *
  * Scale shape: bucket boundaries come from ONE `approxQuantile` pass
  * (Greenwald-Khanna sketch, merged map-side — no sort, no shuffle of the
  * data), bucketing + interleaving are pure per-row expressions (codegen,
  * no UDF), and the only data movement is the range-repartition the
  * rewrite was going to do anyway. Equi-DEPTH buckets (not equi-width)
  * keep skewed columns from collapsing into one giant bucket: every
  * bucket holds ~1/256 of the rows whatever the value distribution.
  */
object ZOrder {

  /** Buckets per column: 256 = 8 bits — with k columns interleaved the
    * z-value spans 8k bits, granular enough to range-split thousands of
    * files while the boundary sketch stays tiny (255 doubles/column). */
  val Buckets = 256

  /** Numeric sort key of a clustering column. Numerics/temporals cast to
    * double; STRINGS map to their first 8 UTF-8 bytes read as an
    * unsigned big-endian integer (zero-padded, so "b" > "ab" holds) —
    * an ORDER-PRESERVING proxy: byte-prefix order is UTF8String binary
    * order, unsigned-to-double conversion is monotone, and the whole
    * chain is codegen'd expressions (encode → substring → hex → conv),
    * no UDF. Strings sharing an 8-byte prefix collapse into one proxy
    * value — they simply share a bucket, which only costs skipping
    * granularity, never correctness (the files' own string min/max
    * stats stay exact up to truncation). */
  private[graft] def sortKey(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.StringType =>
        conv(hex(substring(
          concat(encode(col(c), "UTF-8"), lit(Array.fill[Byte](8)(0))),
          1, 8)), 16, 10).cast("double")
      // temporals: their internal representation (days / micros) — a
      // direct cast to double is not a legal Spark cast for these
      case org.apache.spark.sql.types.DateType =>
        unix_date(col(c)).cast("double")
      case org.apache.spark.sql.types.TimestampType =>
        unix_micros(col(c)).cast("double")
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(to_timestamp(col(c))).cast("double")
      case _ => col(c).cast("double")
    }

  /** One-pass equi-depth boundaries for each column via `approxQuantile`
    * over the numeric sort keys (relative error 1e-3 keeps bucket
    * populations within ~0.1% of ideal at any scale). String columns
    * quantile over their order-preserving byte-prefix proxy. */
  def boundaries(df: DataFrame, cols: Seq[String]): Map[String, Array[Double]] = {
    val probs = (1 until Buckets).map(_.toDouble / Buckets).toArray
    val keyed = cols.indices.map(i => s"__graft_zk$i")
    val df2 = cols.zip(keyed).foldLeft(df) { case (d, (c, k)) =>
      d.withColumn(k, sortKey(df, c))
    }
    cols.zip(df2.stat.approxQuantile(keyed.toArray, probs, 1e-3)).toMap
  }

  /** Equi-depth bucket index of `c` given its sorted boundaries: the
    * count of boundaries ≤ value. A codegen'd BINARY SEARCH expression
    * (O(log B) primitive compares/row) — the original higher-order
    * `aggregate` fold was O(B) per row AND interpreted (`ArrayAggregate`
    * is CodegenFallback), which dominated z-order compaction: the range
    * repartition evaluates the z-value once to sample and once to
    * shuffle, so every clustered row paid 2×255 boxed lambda steps per
    * column. NULLs land in bucket 0 — they cluster together at the
    * z-curve's origin (unchanged). */
  def bucket(c: Column, bounds: Array[Double]): Column =
    toCol(BucketIndex(toExpr(c.cast("double")), bounds))

  /** `upperBound(bounds, value)` as a whole-stage-codegen expression
    * (same discipline as VectorExpressions: interpreted eval + a single
    * static Kernels call in generated code). NULL input → bucket 0, so
    * the expression itself is never null. */
  case class BucketIndex(child: Expression, bounds: Array[Double])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = false
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bucket_index expects DOUBLE, got ${child.dataType}")
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) 0 else Kernels.upperBound(bounds, v.asInstanceOf[Double])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val b = ctx.addReferenceObj("zBounds", bounds, "double[]")
      val c = child.genCode(ctx)
      ev.copy(code = code"""
        ${c.code}
        int ${ev.value} = ${c.isNull} ? 0 :
          graft.functions.Kernels.upperBound($b, ${c.value});""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): BucketIndex =
      copy(child = c)
  }

  /** Interleave the low 8 bits of each bucket column into one long:
    * bit `b` of column `i` lands at position `b*k + i`. */
  def interleave(buckets: Seq[Column]): Column = {
    val k = buckets.length
    var acc: Column = lit(0L)
    for (b <- 0 until 8; i <- 0 until k) {
      val bit = shiftright(buckets(i), b).bitwiseAND(lit(1)).cast("long")
      acc = acc.bitwiseOR(shiftleft(bit, b * k + i))
    }
    acc
  }

  /** The z-value column for `cols` of `df` (runs the boundary pass). */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.length >= 2, "z-order needs at least 2 columns")
    // 8 bits × k columns must fit one long: shiftleft silently wraps the
    // amount mod 64, which would alias different columns' bit positions
    require(cols.length <= 8, s"z-order supports at most 8 columns, got ${cols.length}")
    val bs = boundaries(df, cols)
    interleave(cols.map(c => bucket(sortKey(df, c), bs(c))))
  }
}
