package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession
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
  *     `_MANIFEST` (file → row count) via write-temp + overwrite rename
  *     (`FileContext.rename(OVERWRITE)`, atomic on HDFS-semantics
  *     filesystems). The manifest is the single atomic publish point: a
  *     driver crash mid-commit can leave part files visible to directory
  *     listing, so READERS MUST TRUST ONLY `_MANIFEST`-LISTED FILES (the
  *     `_spark_metadata` idea); the spec reads through the manifest.
  *   - `BatchWrite.abort` removes this job's staging namespace only.
  *
  * All I/O goes through the Hadoop `FileSystem` API resolved from the
  * session's Hadoop configuration (serialized to executors the way
  * FileFormatWriter ships its job conf), so any `fs.*` scheme works —
  * local paths in tests, HDFS/object stores in production. Rows
  * serialize as CSV of the row's fields. `failPartition` injects a
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

/** Hadoop Configuration is not java-serializable; ship it to the task
  * writers via Writable round-trip (the same trick Spark's own
  * SerializableConfiguration uses — that class is private[spark]). */
private[sources] class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[sources] class ManifestTable(schema0: StructType)
    extends Table with SupportsWrite {
  override def name(): String = "graft_manifest_sink"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val raw = Option(info.options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-manifest sink requires .option(\"path\", <directory URI>)"))
    if (raw.trim.isEmpty) throw new IllegalArgumentException(
      "graft-manifest sink: path option is empty — pass a directory URI")
    val path =
      try new Path(raw)
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"graft-manifest sink: malformed path '$raw': ${e.getMessage}", e)
      }
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ManifestBatchWrite(
          path.toString, info.queryId(),
          Option(info.options.get("failPartition")).map(_.toInt).getOrElse(-1),
          info.schema(),
          new SerializableHadoopConf(
            SparkSession.active.sessionState.newHadoopConf()))
      }
    }
  }
}

private[sources] case class FileCommitted(name: String, rows: Long)
  extends WriterCommitMessage

private[sources] class ManifestBatchWrite(path: String, queryId: String,
    failPartition: Int, schema: StructType,
    conf: SerializableHadoopConf) extends BatchWrite {

  // Per-job staging namespace: concurrent writes (or an overlapping retry
  // of another job) can never see or delete each other's in-flight files.
  private val stagingName = s".staging-$queryId"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestWriterFactory(path, stagingName, failPartition, schema, conf)

  // Driver-side, exactly once, only after EVERY task committed: publish.
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    val staging = new Path(dir, stagingName)
    val entries = messages.map { case FileCommitted(tmp, rows) =>
      val fin = tmp.stripSuffix(".tmp")
      val ok = fs.rename(new Path(staging, tmp), new Path(dir, fin))
      require(ok, s"staged file $tmp vanished before commit")
      s"$fin,$rows"
    }
    // Publish point: manifest lands atomically (temp + overwrite rename),
    // so a reader either sees the complete file list or the previous one.
    val tmpManifest = new Path(staging, "_MANIFEST.inprogress")
    val out = fs.create(tmpManifest, true)
    try out.write(entries.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    FileContext.getFileContext(dir.toUri, conf.value).rename(
      tmpManifest, new Path(dir, "_MANIFEST"), Options.Rename.OVERWRITE)
    fs.delete(staging, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    dir.getFileSystem(conf.value)
      .delete(new Path(dir, stagingName), true)
  }
}

private[sources] class ManifestWriterFactory(path: String, stagingName: String,
    failPartition: Int, schema: StructType,
    conf: SerializableHadoopConf) extends DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val name = f"part-$partitionId%05d-$taskId.tmp"
    private val file = new Path(new Path(path, stagingName), name)
    private val fs: FileSystem = file.getFileSystem(conf.value)
    private val out = new java.io.PrintWriter(fs.create(file, true))
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
    override def abort(): Unit = { out.close(); fs.delete(file, false) }
    override def close(): Unit = out.close()
  }
}
