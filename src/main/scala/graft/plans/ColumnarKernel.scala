package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{ColumnarRule, ProjectExec, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

import graft.functions.Kernels
import graft.functions.VectorExpressions.Hamming64

/** Columnar-execution seam (`SparkSessionExtensions.injectColumnar` — the
  * hook Photon/RAPIDS-class accelerators plug; no counterpart exists in
  * the 2.1-era reference, whose columnar code stops at the parquet reader
  * `sql/core/.../parquet/VectorizedColumnReader.java`): when a projection
  * over a COLUMNAR child computes `hamming64(a, b)` (plus column
  * passthroughs), replace the row-based ProjectExec with a batch kernel
  * that runs directly on the child's `ColumnarBatch`es — the fingerprint
  * distance is evaluated over primitive long vectors with zero row
  * materialization, and the single ColumnarToRow transition moves ABOVE
  * the kernel.
  *
  * Deliberately narrow: only fires when every project item is an
  * attribute passthrough or an `Alias(Hamming64(attr, attr))` over
  * non-nullable long columns and the child already supports columnar.
  * Anything else keeps Spark's stock plan — an accelerator that can't
  * run a plan must leave it alone, not break it. */
object GraftColumnarRule extends ColumnarRule {
  override def preColumnarTransitions: Rule[SparkPlan] = HammingToColumnar
}

private object HammingToColumnar extends Rule[SparkPlan] {
  private def supported(p: ProjectExec): Boolean =
    p.child.supportsColumnar && p.projectList.forall {
      case _: AttributeReference => true
      case Alias(Hamming64(a: AttributeReference, b: AttributeReference), _)
        if !a.nullable && !b.nullable => true
      case _ => false
    } && p.projectList.exists {
      case Alias(_: Hamming64, _) => true
      case _ => false
    }

  override def apply(plan: SparkPlan): SparkPlan = plan.transformUp {
    case p: ProjectExec if supported(p) =>
      ColumnarHammingProjectExec(p.projectList, p.child)
  }
}

/** Batch-at-a-time projection: passthrough columns are REFERENCED from
  * the input batch (zero copy); each `hamming64` output is one primitive
  * int vector filled by a tight popcount loop over the two long vectors.
  * Output batches share the input's row count, so downstream transitions
  * see the same batch cadence as the scan produced. */
case class ColumnarHammingProjectExec(projectList: Seq[NamedExpression],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = projectList.map(_.toAttribute)
  override def supportsColumnar: Boolean = true
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering = child.outputOrdering

  private def colIndex(a: AttributeReference): Int = {
    val i = child.output.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"column ${a.name} not found in child output")
    i
  }

  override def doExecuteColumnar(): RDD[ColumnarBatch] = {
    // resolve plan-time: (passthrough index) | (left index, right index)
    val plan: Array[Either[Int, (Int, Int)]] = projectList.map {
      case a: AttributeReference => Left(colIndex(a))
      case Alias(Hamming64(a: AttributeReference, b: AttributeReference), _) =>
        Right((colIndex(a), colIndex(b)))
      case other => throw new IllegalStateException(s"unsupported: $other")
    }.toArray
    child.executeColumnar().map { batch =>
      val n = batch.numRows()
      val out: Array[ColumnVector] = plan.map {
        case Left(i) => batch.column(i)
        case Right((ai, bi)) =>
          val v = new OnHeapColumnVector(n, IntegerType)
          val (a, b) = (batch.column(ai), batch.column(bi))
          var j = 0
          while (j < n) {
            v.putInt(j, Kernels.hamming64(a.getLong(j), b.getLong(j)))
            j += 1
          }
          v
      }
      new ColumnarBatch(out, n)
    }
  }

  /** Row fallback (canonicalization / non-columnar parents): iterate the
    * columnar result — correctness identical, never the hot path. */
  override protected def doExecute(): RDD[InternalRow] = {
    val schema = output.map(_.dataType).toArray
    doExecuteColumnar().mapPartitions { it =>
      it.flatMap { batch =>
        val rows = batch.rowIterator()
        new Iterator[InternalRow] {
          override def hasNext: Boolean = rows.hasNext
          override def next(): InternalRow = {
            val r = rows.next()
            InternalRow.fromSeq(schema.indices.map(i => r.get(i, schema(i))))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan) = copy(child = c)
}
