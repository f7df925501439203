package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{ColumnarRule, ProjectExec, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

import graft.functions.Kernels
import graft.functions.VectorExpressions.{CosineSimilarity, Hamming64}

/** Columnar-execution seam (`SparkSessionExtensions.injectColumnar` — the
  * hook Photon/RAPIDS-class accelerators plug; no counterpart exists in
  * the 2.1-era reference, whose columnar code stops at the parquet reader
  * `sql/core/.../parquet/VectorizedColumnReader.java`): when a projection
  * over a COLUMNAR child computes one of the engine's kernels, replace
  * the row-based ProjectExec with a batch operator that runs directly on
  * the child's `ColumnarBatch`es, and the single ColumnarToRow transition
  * moves ABOVE the kernel. Claimed kernels:
  *
  *   - `hamming64(a, b)` over non-nullable long columns — the SimHash
  *     fingerprint distance as a popcount loop over two long vectors
  *     (round 9).
  *   - `cosine(vec, other)` over `array<float>` columns — the ANN
  *     scoring loop (round 10). `other` is either a second array column
  *     (pairwise scoring) or a LITERAL query vector (the brute-force
  *     top-k shape: score every corpus row against a broadcast query).
  *     Array access goes through `ColumnVector.getArray` (a zero-copy
  *     `ColumnarArray` view over the child value vector — the same
  *     layout Spark's vectorized parquet reader produces for nested
  *     columns), feeding the identical `Kernels.cosineF` the row path
  *     codegens, so results are bit-equal by construction. NULL rows
  *     propagate as NULL output (the expressions are null-intolerant).
  *
  * Deliberately narrow: only fires when every project item is an
  * attribute passthrough or a claimed kernel and the child already
  * supports columnar. Anything else keeps Spark's stock plan — an
  * accelerator that can't run a plan must leave it alone, not break it. */
object GraftColumnarRule extends ColumnarRule {
  override def preColumnarTransitions: Rule[SparkPlan] = ProjectToColumnarKernel
}

private object ProjectToColumnarKernel extends Rule[SparkPlan] {
  private def isFloatArray(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    e.dataType match {
      // containsNull arrays are claimable because Kernels.cosineF treats
      // NULL elements as 0.0 explicitly (isNullAt per element) — without
      // that check a reused OnHeapColumnVector's null slot would read
      // stale bytes and scores would depend on batch order.
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  private def claimable(e: NamedExpression): Boolean = e match {
    case _: AttributeReference => true
    case Alias(Hamming64(a: AttributeReference, b: AttributeReference), _)
      if !a.nullable && !b.nullable => true
    case Alias(CosineSimilarity(a: AttributeReference, b: AttributeReference), _)
      if isFloatArray(a) && isFloatArray(b) => true
    case Alias(CosineSimilarity(a: AttributeReference, l: Literal), _)
      if isFloatArray(a) && isFloatArray(l) && l.value != null => true
    case _ => false
  }

  private def isKernel(e: NamedExpression): Boolean = e match {
    case Alias(_: Hamming64, _) | Alias(_: CosineSimilarity, _) => true
    case _ => false
  }

  private def supported(p: ProjectExec): Boolean =
    p.child.supportsColumnar && p.projectList.forall(claimable) &&
      p.projectList.exists(isKernel)

  override def apply(plan: SparkPlan): SparkPlan =
    // session kill-switch (default ON) — lets benchmarks measure the row
    // path on identical plans and gives operators an escape hatch, the
    // discipline every accelerator rule needs
    if (!org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.columnar.enabled", "true").toBoolean) plan
    else plan.transformUp {
      case p: ProjectExec if supported(p) =>
        ColumnarKernelProjectExec(p.projectList, p.child)
    }
}

/** Plan-time resolved projection item (serialized to tasks). The query
  * literal is carried as a primitive float array, not an `ArrayData`
  * (UnsafeArrayData is not java-serializable), and re-wrapped once per
  * partition. */
private[plans] sealed trait KernelItem extends Serializable
private[plans] case class PassThrough(i: Int) extends KernelItem
private[plans] case class HammingCols(a: Int, b: Int) extends KernelItem
private[plans] case class CosineCols(a: Int, b: Int,
    aNullable: Boolean, bNullable: Boolean) extends KernelItem
private[plans] case class CosineQuery(a: Int, aNullable: Boolean,
    query: Array[Float]) extends KernelItem

/** Batch-at-a-time projection: passthrough columns are REFERENCED from
  * the input batch (zero copy); each kernel output is one primitive
  * vector filled by a tight loop over the child vectors. Output batches
  * share the input's row count, so downstream transitions see the same
  * batch cadence as the scan produced. */
case class ColumnarKernelProjectExec(projectList: Seq[NamedExpression],
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

  private def floatsOf(l: Literal): Array[Float] =
    l.value.asInstanceOf[ArrayData].toFloatArray()

  override def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val plan: Array[KernelItem] = projectList.map {
      case a: AttributeReference => PassThrough(colIndex(a))
      case Alias(Hamming64(a: AttributeReference, b: AttributeReference), _) =>
        HammingCols(colIndex(a), colIndex(b))
      case Alias(CosineSimilarity(a: AttributeReference, b: AttributeReference), _) =>
        CosineCols(colIndex(a), colIndex(b), a.nullable, b.nullable)
      case Alias(CosineSimilarity(a: AttributeReference, l: Literal), _) =>
        CosineQuery(colIndex(a), a.nullable, floatsOf(l))
      case other => throw new IllegalStateException(s"unsupported: $other")
    }.toArray
    // OWNERSHIP: output batches mix vectors BORROWED from the input batch
    // (passthroughs, zero copy — closed by the source reader that
    // allocated them) with kernel-OWNED vectors. Downstream must not
    // close the output batch (Spark's ColumnarToRow never does; a
    // downstream that did would double-close the source's vectors). The
    // kernel releases its own vectors when the next batch is requested —
    // the consumer has fully drained the previous batch by then, the same
    // cadence the vectorized parquet reader relies on — and a
    // task-completion listener releases the final batch's.
    child.executeColumnar().mapPartitions { it =>
      new Iterator[ColumnarBatch] {
        private var owned: List[OnHeapColumnVector] = Nil
        private def release(): Unit = { owned.foreach(_.close()); owned = Nil }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => release()))

        // one ArrayData wrap of the query vector per partition
        private val queries: Map[Int, ArrayData] = plan.zipWithIndex.collect {
          case (CosineQuery(_, _, q), i) =>
            i -> org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
              .fromPrimitiveArray(q).asInstanceOf[ArrayData]
        }.toMap

        override def hasNext: Boolean = it.hasNext
        override def next(): ColumnarBatch = {
          release()
          val batch = it.next()
          val n = batch.numRows()
          def owning(v: OnHeapColumnVector): OnHeapColumnVector = {
            owned ::= v; v
          }
          val out: Array[ColumnVector] = plan.zipWithIndex.map {
            case (PassThrough(i), _) => batch.column(i)
            case (HammingCols(ai, bi), _) =>
              val v = owning(new OnHeapColumnVector(n, IntegerType))
              val (a, b) = (batch.column(ai), batch.column(bi))
              var j = 0
              while (j < n) {
                v.putInt(j, Kernels.hamming64(a.getLong(j), b.getLong(j)))
                j += 1
              }
              v
            case (CosineCols(ai, bi, aNull, bNull), _) =>
              val v = owning(new OnHeapColumnVector(n, DoubleType))
              val (a, b) = (batch.column(ai), batch.column(bi))
              var j = 0
              while (j < n) {
                if ((aNull && a.isNullAt(j)) || (bNull && b.isNullAt(j)))
                  v.putNull(j)
                else v.putDouble(j, Kernels.cosineF(a.getArray(j), b.getArray(j)))
                j += 1
              }
              v
            case (CosineQuery(ai, aNull, _), idx) =>
              val v = owning(new OnHeapColumnVector(n, DoubleType))
              val a = batch.column(ai)
              val q = queries(idx)
              var j = 0
              while (j < n) {
                if (aNull && a.isNullAt(j)) v.putNull(j)
                else v.putDouble(j, Kernels.cosineF(a.getArray(j), q))
                j += 1
              }
              v
          }
          new ColumnarBatch(out, n)
        }
      }
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
