package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 (the reference's source-extension seam,
  * `BaseRelation`/`RowDataSourceScanExec` `DataSourceScanExec.scala:50`,
  * modernized to the connector API): a deterministic synthetic table
  *
  *   id BIGINT, grp BIGINT = id % 100, val STRING = md5(id)
  *
  * of `rows` rows in `partitions` splits. It implements the two
  * pushdowns that matter at 100 TB — `SupportsPushDownRequiredColumns`
  * (never materialize the md5 column for queries that don't read it) and
  * `SupportsPushDownFilters` for id-range predicates (each split narrows
  * its generation range, so a `WHERE id < k` scan does O(k) work
  * regardless of table size — the DSv2 analogue of partition pruning).
  * Because the generator is pure SQL (`generate_series` + md5), DuckDB
  * replays the whole table and q183 hash-checks scan + both pushdowns.
  *
  * Usage: `spark.read.format("graft-synth").option("rows", n).load()`.
  */
class SynthSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("columnar", "false").toBoolean)
}

object SynthSource {
  val schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("grp", LongType, nullable = false)
    .add("val", StringType, nullable = false)

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
}

private[sources] class SynthTable(rows: Long, partitions: Int,
    columnar: Boolean) extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions, columnar)
}

private[sources] class SynthScanBuilder(rows: Long, partitions: Int,
    columnar: Boolean) extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = SynthSource.schema
  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private val pushed = ArrayBuffer.empty[Filter]

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Accept id-range filters; everything else stays post-scan in Spark.
  override def pushFilters(filters: Array[Filter]): Array[Filter] =
    filters.filterNot {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); pushed += GreaterThan("id", v); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); pushed += GreaterThanOrEqual("id", v); true
      case LessThan("id", v: Long) => hi = math.min(hi, v); pushed += LessThan("id", v); true
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); pushed += LessThanOrEqual("id", v); true
      case _ => false
    }
  override def pushedFilters(): Array[Filter] = pushed.toArray

  override def build(): Scan =
    new SynthScan(lo, hi, partitions, required, columnar)
}

private[sources] case class SynthPartition(start: Long, end: Long)
  extends InputPartition

private[sources] class SynthScan(lo: Long, hi: Long, partitions: Int,
    required: StructType, columnar: Boolean) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth [$lo, $hi) cols=${required.fieldNames.mkString(",")}" +
      (if (columnar) " columnar" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1L, hi - lo)
    val per = math.max(1L, (n + partitions - 1) / partitions)
    (lo until hi by per).map(s =>
      SynthPartition(s, math.min(hi, s + per))).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames, columnar)
}

/** Row OR vectorized reads behind DSv2's columnar seam
  * (`supportColumnarReads` → `createColumnarReader`): with
  * `option("columnar", true)` the scan emits `ColumnarBatch`es of
  * `OnHeapColumnVector`s — the same contract Spark's own vectorized
  * parquet reader uses — and the planner inserts the single
  * `ColumnarToRow` transition (itself codegen'd) instead of one
  * `InternalRow` allocation per row. At 100 TB this is the difference
  * between a scan that feeds whole-stage codegen batch-at-a-time and one
  * that boxes every row at the source boundary. */
private[sources] class SynthReaderFactory(cols: Array[String],
    columnar: Boolean) extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = columnar

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SynthPartition]
    new PartitionReader[InternalRow] {
      private var i = sp.start - 1
      override def next(): Boolean = { i += 1; i < sp.end }
      override def get(): InternalRow = InternalRow.fromSeq(cols.toSeq.map {
        case "id" => i
        case "grp" => i % 100
        case "val" => UTF8String.fromString(SynthSource.md5Hex(i.toString))
      })
      override def close(): Unit = ()
    }
  }

  override def createColumnarReader(
      p: InputPartition): PartitionReader[ColumnarBatch] = {
    val sp = p.asInstanceOf[SynthPartition]
    val schema = StructType(cols.map(c => SynthSource.schema(c)))
    new PartitionReader[ColumnarBatch] {
      private val capacity = 4096
      private var cur = sp.start
      private var batch: ColumnarBatch = _

      override def next(): Boolean = {
        if (cur >= sp.end) return false
        val n = math.min(capacity.toLong, sp.end - cur).toInt
        val vectors = OnHeapColumnVector.allocateColumns(n, schema)
        var j = 0
        while (j < n) {
          val id = cur + j
          var k = 0
          while (k < cols.length) {
            cols(k) match {
              case "id" => vectors(k).putLong(j, id)
              case "grp" => vectors(k).putLong(j, id % 100)
              case "val" => vectors(k).putByteArray(j,
                SynthSource.md5Hex(id.toString).getBytes("UTF-8"))
            }
            k += 1
          }
          j += 1
        }
        if (batch != null) batch.close()
        batch = new ColumnarBatch(vectors.toArray[
          org.apache.spark.sql.vectorized.ColumnVector], n)
        cur += n
        true
      }

      override def get(): ColumnarBatch = batch
      override def close(): Unit = if (batch != null) batch.close()
    }
  }
}
