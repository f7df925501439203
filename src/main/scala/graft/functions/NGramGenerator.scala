package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating expression (UDTF surface): `ngrams(words, n)`
  * emits one row per word n-gram of the input token array.
  *
  * Pattern follows the reference's `Generator` contract
  * (`sql/catalyst/.../expressions/generators.scala:68`,
  * `UserDefinedGenerator`): the analyzer's `ExtractGenerators` rule lifts
  * the expression out of the `Project` into a `Generate` logical node,
  * which plans to `GenerateExec` (`sql/core/.../GenerateExec.scala:52`) —
  * the per-row fan-out is streamed, never materialized as a whole array
  * per document the way the `transform(sequence(...))` + `explode` idiom
  * builds it. That is the scale win: a 100k-token document produces 100k
  * output rows without ever holding a 100k-element array in the row
  * buffer.
  *
  * Emits n-grams directly as `UTF8String.concat` of array slices —
  * zero-copy over the input's UTF8 bytes. Null token entries (possible
  * only if the caller built the array with explicit nulls — `split` never
  * does) make their n-gram null-join like SQL `concat`.
  */
case class NGramGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, "ngram size must be >= 1")

  override def elementSchema: StructType =
    new StructType().add("ngram", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ngrams expects array<string>, got $dt")
  }

  private val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Iterator.empty
    else {
      val len = arr.numElements()
      // One reusable slot buffer (separators pre-set) and one reusable
      // output row for the whole document: GenerateExec projects each
      // emitted row into its own unsafe buffer before anything retains
      // it (same single-row-reuse contract explode's iterator relies
      // on), so per-ngram allocation is just the concat result.
      val parts = new Array[UTF8String](2 * n - 1)
      var k = 1
      while (k < parts.length) { parts(k) = sep; k += 2 }
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      (0 to len - n).iterator.map { i =>
        var j = 0
        while (j < n) {
          parts(2 * j) = arr.getUTF8String(i + j)
          j += 1
        }
        row.update(0, UTF8String.concat(parts: _*))
        row
      }
    }
  }

  override def prettyName: String = "ngrams"

  override protected def withNewChildInternal(
      newChild: Expression): NGramGenerator = copy(child = newChild)
}

object NGramGenerator {
  /** Column API: `ngrams(words, n)` — use in `select` like `explode`. */
  def ngrams(words: Column, n: Int): Column =
    ColumnBridge.column(NGramGenerator(ColumnBridge.expression(words), n))
}

/** Optimizer rule (the reference's `Rule[LogicalPlan]` seam,
  * `sql/catalyst/.../rules/Rule.scala`; registered through
  * `GraftExtensions.injectOptimizerRule` or
  * `spark.experimental.extraOptimizations`): `ngrams(words, 1)` emits
  * each element unchanged, which is exactly `explode(words)` — and
  * Spark's built-in `Explode` supports whole-stage codegen in
  * `GenerateExec` while the custom generator is CodegenFallback. The
  * rewrite fires only when the element nullability matches (our schema
  * declares non-null; `Explode` inherits the array's containsNull), so
  * it can never loosen the output contract. */
object NGramSimplification
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Explode
  import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case g @ Generate(NGramGenerator(child, 1), _, _, _, _, _)
        if {
          val e = Explode(child).elementSchema.head
          val n = g.generator.elementSchema.head
          e.dataType == n.dataType && e.nullable == n.nullable
        } =>
      g.copy(generator = Explode(child))
  }
}
