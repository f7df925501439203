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
  *   - each job stages under its own namespace `.staging-<queryId>/` so
  *     two concurrent writes to the same path never touch each other's
  *     in-flight files (each abort sweeps only its own staging dir);
  *   - each task's `DataWriter` streams rows to a staged part file and
  *     only its `commit()` reports the file; `abort()` deletes it, so
  *     failed/retried/speculated attempts leave nothing visible;
  *   - `BatchWrite.commit(messages)` — driver-side, runs once, after every
  *     task committed — moves the staged files up and then publishes
  *     `_MANIFEST` (file → row count) via write-temp + ATOMIC_MOVE.
  *     The manifest is the single atomic publish point: a driver crash
  *     mid-commit can leave part files visible to directory listing, so
  *     READERS MUST TRUST ONLY `_MANIFEST`-LISTED FILES (the
  *     `_spark_metadata` idea); the spec reads through the manifest.
  *   - `BatchWrite.abort` removes this job's staging namespace only.
  *
  * Local-filesystem sink by design (java.io; the commit choreography is
  * the point, not a Hadoop FS abstraction — the production analogue is
  * `FileFormatWriter` over `FileSystem`). Rows serialize as CSV of the
  * row's fields. `failPartition` injects a first-attempt task failure for
  * ManifestSinkSpec's abort/atomicity proofs.
  * Usage: `df.write.format("graft-manifest").option("path", p)`.
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
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = Option(info.options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-manifest sink requires .option(\"path\", <local directory>)"))
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ManifestBatchWrite(
          path, info.queryId(),
          Option(info.options.get("failPartition")).map(_.toInt).getOrElse(-1),
          info.schema())
      }
    }
  }
}

private[sources] case class FileCommitted(name: String, rows: Long)
  extends WriterCommitMessage

private[sources] class ManifestBatchWrite(path: String, queryId: String,
    failPartition: Int, schema: StructType) extends BatchWrite {

  // Per-job staging namespace: concurrent writes (or an overlapping retry
  // of another job) can never see or delete each other's in-flight files.
  private val stagingName = s".staging-$queryId"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestWriterFactory(path, stagingName, failPartition, schema)

  // Driver-side, exactly once, only after EVERY task committed: publish.
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    val staging = new java.io.File(dir, stagingName)
    val entries = messages.map { case FileCommitted(tmp, rows) =>
      val fin = tmp.stripSuffix(".tmp")
      val ok = new java.io.File(staging, tmp)
        .renameTo(new java.io.File(dir, fin))
      require(ok, s"staged file $tmp vanished before commit")
      s"$fin,$rows"
    }
    // Publish point: manifest lands atomically (temp + ATOMIC_MOVE), so a
    // reader either sees the complete file list or the previous manifest.
    val tmpManifest = staging.toPath.resolve("_MANIFEST.inprogress")
    java.nio.file.Files.write(tmpManifest,
      entries.sorted.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmpManifest, dir.toPath.resolve("_MANIFEST"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    deleteStaging(staging)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteStaging(new java.io.File(new java.io.File(path), stagingName))

  private def deleteStaging(staging: java.io.File): Unit = {
    Option(staging.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    staging.delete()
  }
}

private[sources] class ManifestWriterFactory(path: String, stagingName: String,
    failPartition: Int, schema: StructType) extends DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val name = f"part-$partitionId%05d-$taskId.tmp"
    private val file = new java.io.File(new java.io.File(path, stagingName), name)
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
