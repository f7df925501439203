package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 WRITE path with the two-phase commit protocol
  * (reference: `FileFormatWriter` + `HadoopMapReduceCommitProtocol` —
  * task writers stage output, the DRIVER publishes atomically):
  *
  *   - each task's `DataWriter` streams rows to `part-<task>-<attempt>.tmp`
  *     and only its `commit()` reports the file; `abort()` deletes it, so
  *     failed/retried/speculated attempts leave nothing visible;
  *   - `BatchWrite.commit(messages)` — driver-side, runs once, after every
  *     task committed — renames the staged files and writes `_MANIFEST`
  *     (file → row count); readers that trust only manifest-listed files
  *     get atomic all-or-nothing visibility (the `_spark_metadata` idea);
  *   - `BatchWrite.abort` removes any staged leftovers.
  *
  * Rows serialize as CSV of the row's fields (toString — the payload is
  * not the point; the commit choreography is). `failPartition` injects a
  * first-attempt task failure for ManifestSinkSpec's abort/atomicity
  * proofs. Usage: `df.write.format("graft-manifest").option("path", p)`.
  */
class ManifestSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-manifest"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ManifestTable(schema)
}

private[sources] class ManifestTable(schema0: StructType)
    extends Table with SupportsWrite {
  override def name(): String = "graft_manifest_sink"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ManifestBatchWrite(
          info.options.get("path"),
          Option(info.options.get("failPartition")).map(_.toInt).getOrElse(-1),
          info.schema())
      }
    }
}

private[sources] case class FileCommitted(name: String, rows: Long)
  extends WriterCommitMessage

private[sources] class ManifestBatchWrite(path: String, failPartition: Int,
    schema: StructType) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestWriterFactory(path, failPartition, schema)

  // Driver-side, exactly once, only after EVERY task committed: publish.
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    val entries = messages.map { case FileCommitted(tmp, rows) =>
      val fin = tmp.stripSuffix(".tmp")
      val ok = new java.io.File(dir, tmp).renameTo(new java.io.File(dir, fin))
      require(ok, s"staged file $tmp vanished before commit")
      s"$fin,$rows"
    }
    java.nio.file.Files.write(dir.toPath.resolve("_MANIFEST"),
      entries.sorted.mkString("\n").getBytes("UTF-8"))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".tmp")).foreach(_.delete())
  }
}

private[sources] class ManifestWriterFactory(path: String, failPartition: Int,
    schema: StructType) extends DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val name = f"part-$partitionId%05d-$taskId.tmp"
    private val file = new java.io.File(path, name)
    file.getParentFile.mkdirs()
    private val out = new java.io.PrintWriter(file, "UTF-8")
    private var rows = 0L
    private val attempt = org.apache.spark.TaskContext.get().attemptNumber()

    override def write(r: InternalRow): Unit = {
      if (partitionId == failPartition && attempt == 0 && rows == 2)
        throw new RuntimeException("injected write failure")
      out.println(schema.indices.map(i =>
        String.valueOf(r.get(i, schema(i).dataType))).mkString(","))
      rows += 1
    }
    override def commit(): WriterCommitMessage = {
      out.close()
      FileCommitted(name, rows)
    }
    override def abort(): Unit = { out.close(); file.delete() }
    override def close(): Unit = out.close()
  }
}
