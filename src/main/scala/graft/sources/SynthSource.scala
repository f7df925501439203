package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
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
      properties.getOrDefault("columnar", "false").toBoolean,
      properties.getOrDefault("clustered", "false").toBoolean)
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
    columnar: Boolean, clustered: Boolean) extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions, columnar, clustered)
}

private[sources] class SynthScanBuilder(rows: Long, partitions: Int,
    columnar: Boolean, clustered: Boolean = false) extends ScanBuilder
    with SupportsPushDownRequiredColumns
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
    new SynthScan(lo, hi, partitions, required, columnar, clustered)
}

private[sources] case class SynthPartition(start: Long, end: Long)
  extends InputPartition

/** Explicit surviving-id split produced by a runtime In-filter. */
private[sources] case class SynthIdsPartition(ids: Array[Long])
  extends InputPartition

/** One grp residue class (id ≡ grp mod 100 within [lo, hi)) — the
  * key-grouped split shape behind storage-partitioned joins. */
private[sources] case class SynthGrpPartition(grp: Long, lo: Long, hi: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](grp))
}

private[sources] object SynthScan {
  /** grp = id % 100 — the fixed key-group count of the synthetic table. */
  val Groups = 100
}

/** Runtime (join-driven) filtering in addition to the static pushdown:
  * `SupportsRuntimeFiltering` lets Spark hand this scan the build side's
  * key set AFTER the join's other side has executed (the DSv2 analogue
  * of dynamic partition pruning, SPARK-35779 — the seam Iceberg uses).
  * An `In(id, ...)` runtime filter collapses the generation ranges to
  * exactly the surviving ids, so a fact-scan joined to a filtered dim
  * generates |dim| rows instead of |fact| — at 100 TB this is the
  * difference between scanning the table and scanning the join's
  * matches. Observable in the scan's output-rows metric (spec). */
private[sources] class SynthScan(private var lo: Long, private var hi: Long,
    partitions: Int, required: StructType, columnar: Boolean,
    clustered: Boolean = false)
    extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportStatistics with SupportsReportPartitioning {
  /** ids surviving a runtime In-filter; None = no runtime filter. */
  private var keep: Option[Array[Long]] = None

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth [$lo, $hi) cols=${required.fieldNames.mkString(",")}" +
      (if (columnar) " columnar" else "")

  /** Post-pushdown stats (`SupportsReportStatistics`): without these a
    * DSv2 relation costs at `spark.sql.defaultSizeInBytes` (huge), so
    * Catalyst would never broadcast it — a small synthetic dim would
    * shuffle a sort-merge join it should broadcast. Row width = 8 (id) +
    * 8 (grp) + 32 (md5 hex) per REQUIRED column, so column pruning also
    * shrinks the estimate. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, hi - lo)
    private val width = required.fieldNames.map {
      case "id" | "grp" => 8L
      case "val" => 32L
    }.sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * math.max(1L, width))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  // Runtime filtering rewrites splits into id-run groups, which would
  // lose the one-split-per-grp shape the reported partitioning promises —
  // a clustered scan advertises no runtime-filterable attributes. Nor
  // does a scan whose output pruned `id` away: Spark resolves the
  // advertised attribute against the scan OUTPUT, and an unresolvable
  // one fails analysis (caught by SynthSpjSpec's pruned-grp aggregate).
  override def filterAttributes(): Array[NamedReference] =
    if (clustered || !required.fieldNames.contains("id")) Array.empty
    else Array(Expressions.column("id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("id", vs) =>
      // All-or-nothing coercion: dropping only the values that fail to
      // coerce would silently EXCLUDE those ids from generation (missing
      // rows) — if any value isn't a Long, ignore the whole runtime
      // filter and keep the static range (always safe, merely unpruned).
      if (vs.forall(_.isInstanceOf[java.lang.Long])) {
        val ids = vs.map(_.asInstanceOf[java.lang.Long].longValue())
          .filter(v => v >= lo && v < hi).sorted
        keep = Some(keep.fold(ids)(prev => prev.intersect(ids)))
      }
    case EqualTo("id", v: java.lang.Long) =>
      keep = Some(keep.fold(Array(v.longValue()))(_.filter(_ == v.longValue()))
        .filter(x => x >= lo && x < hi))
    case _ => // unsupported runtime filter: keep the static range
  }

  /** Storage-partitioned-join seam (`SupportsReportPartitioning`,
    * SPARK-37377 — the DSv2 contract Iceberg's bucket tables use): with
    * `option("clustered", true)` the scan plans ONE split per `grp`
    * value, each carrying its key via `HasPartitionKey`, and reports
    * `KeyGroupedPartitioning(identity(grp))`. Two such tables joined or
    * aggregated on `grp` (with `spark.sql.sources.v2.bucketing.enabled`)
    * plan ZERO shuffles — at 100 TB the co-located join this buys is the
    * difference between exchanging the fact table and exchanging nothing
    * (SynthSpjSpec pins the exchange-free plan; q232 hash-checks it).
    * Reported only while `grp` survives column pruning — Spark resolves
    * the partitioning against the scan's OUTPUT. */
  override def outputPartitioning(): Partitioning =
    if (clustered && required.fieldNames.contains("grp"))
      new KeyGroupedPartitioning(
        Array(Expressions.identity("grp")), SynthScan.Groups)
    // static split count, NOT planInputPartitions(): the planner asks
    // for the partitioning before runtime filters arrive, and planning
    // here would build the split array twice
    else new UnknownPartitioning(partitions)

  override def planInputPartitions(): Array[InputPartition] =
    if (clustered) (0L until SynthScan.Groups.toLong)
      .map(g => SynthGrpPartition(g, lo, hi)).toArray[InputPartition]
    else planRangePartitions()

  private def planRangePartitions(): Array[InputPartition] = keep match {
    case Some(ids) =>
      // one split per partition over the surviving ids, each a run of
      // single-id ranges; empty filter ⇒ empty scan
      if (ids.isEmpty) Array.empty
      else ids.grouped(math.max(1, (ids.length + partitions - 1) / partitions))
        .map(g => SynthIdsPartition(g)).toArray[InputPartition]
    case None =>
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

  /** Uniform id accessor over both split kinds: (index → id, count). */
  private def slice(p: InputPartition): (Long => Long, Long) = p match {
    case SynthPartition(s, e) => ((i: Long) => s + i, e - s)
    case SynthIdsPartition(ids) => ((i: Long) => ids(i.toInt), ids.length.toLong)
    case SynthGrpPartition(g, lo, hi) =>
      // first id ≥ lo with id % 100 == g, then stride 100 up to hi
      val first = lo + ((g - lo % 100 + 100) % 100)
      val count = if (first >= hi) 0L else (hi - first + 99) / 100
      ((i: Long) => first + 100 * i, count)
    case other => throw new IllegalArgumentException(other.toString)
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val (idAt, count) = slice(p)
    new PartitionReader[InternalRow] {
      private var i = -1L
      override def next(): Boolean = { i += 1; i < count }
      override def get(): InternalRow = {
        val id = idAt(i)
        InternalRow.fromSeq(cols.toSeq.map {
          case "id" => id
          case "grp" => id % 100
          case "val" => UTF8String.fromString(SynthSource.md5Hex(id.toString))
        })
      }
      override def close(): Unit = ()
    }
  }

  override def createColumnarReader(
      p: InputPartition): PartitionReader[ColumnarBatch] = {
    val (idAt, count) = slice(p)
    val schema = StructType(cols.map(c => SynthSource.schema(c)))
    new PartitionReader[ColumnarBatch] {
      private val capacity = 4096
      private var cur = 0L
      private var batch: ColumnarBatch = _

      override def next(): Boolean = {
        if (cur >= count) return false
        val n = math.min(capacity.toLong, count - cur).toInt
        val vectors = OnHeapColumnVector.allocateColumns(n, schema)
        var j = 0
        while (j < n) {
          val id = idAt(cur + j)
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
