package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom `TypedImperativeAggregate` (the reference's third aggregate
  * interface, `sql/catalyst/.../expressions/aggregate/interfaces.scala:463`
  * — the one HyperLogLogPlusPlus/Percentile are built on): exact top-k
  * labels per group with an arbitrary serialized buffer.
  *
  * `top_k_labels(value, label, k)` keeps the k (value, label) pairs that
  * are largest under (value DESC, label DESC) and returns the labels as
  * `array<string>`. The buffer is a bounded scratch list — appends are
  * O(1) and it is compacted back to k whenever it reaches 4k, so buffer
  * memory is O(k) no matter how many rows a group has, and partial
  * aggregation means each map task ships at most k pairs per group to the
  * exchange (the same partial→final contract as the built-in declarative
  * aggregates, planned by `AggUtils`). Serialization is a flat
  * length-prefixed (double, utf8) stream — the part UDAF-style aggregates
  * must supply themselves because the buffer is an opaque object between
  * partial and final phases.
  *
  * Deterministic: the (value, label) composite order has no ties two rows
  * can disagree on, so results are independent of partitioning — exactly
  * checkable against a row_number() oracle.
  */
case class TopKLabels(
    valueChild: Expression,
    labelChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, String)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(valueChild, labelChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "top_k_labels"

  override def checkInputDataTypes(): TypeCheckResult =
    (valueChild.dataType, labelChild.dataType) match {
      case (DoubleType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (v, l) => TypeCheckResult.TypeCheckFailure(
        s"top_k_labels expects (double, string), got ($v, $l)")
    }

  private val ord: Ordering[(Double, String)] = Ordering.Tuple2(
    Ordering.Double.TotalOrdering.reverse, Ordering.String.reverse)

  private def compact(buf: ArrayBuffer[(Double, String)]): ArrayBuffer[(Double, String)] = {
    if (buf.length > k) {
      val kept = buf.sorted(ord).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, String)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, String)],
      input: InternalRow): ArrayBuffer[(Double, String)] = {
    val v = valueChild.eval(input)
    val l = labelChild.eval(input)
    if (v != null && l != null) {
      buf += ((v.asInstanceOf[Double], l.asInstanceOf[UTF8String].toString))
      if (buf.length >= 4 * k) compact(buf) else buf
    } else buf
  }

  override def merge(buf: ArrayBuffer[(Double, String)],
      other: ArrayBuffer[(Double, String)]): ArrayBuffer[(Double, String)] =
    compact(buf ++= other)

  override def eval(buf: ArrayBuffer[(Double, String)]): Any =
    new GenericArrayData(
      buf.sorted(ord).take(k).map(p => UTF8String.fromString(p._2)).toArray[Any])

  // Labels are length-prefixed raw UTF-8 (writeUTF's 2-byte length field
  // caps strings at 65535 encoded bytes — a real document label can exceed
  // that, and a serde that throws mid-shuffle is a job killer).
  override def serialize(buf: ArrayBuffer[(Double, String)]): Array[Byte] = {
    val kept = compact(buf)
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(kept.length)
    kept.foreach { case (v, l) =>
      out.writeDouble(v)
      val b = l.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, String)]
    var i = 0
    while (i < n) {
      val v = in.readDouble()
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf += ((v, new String(b, java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLabels =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLabels =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLabels =
    copy(valueChild = newChildren(0), labelChild = newChildren(1))
}

object TopKAggregate {
  /** Column API: `top_k_labels(value, label, k)` aggregate. */
  def topKLabels(value: Column, label: Column, k: Int): Column =
    ColumnBridge.column(
      TopKLabels(ColumnBridge.expression(value),
        ColumnBridge.expression(label), k).toAggregateExpression())
}
