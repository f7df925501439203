package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** READ half of the manifest table format (ManifestSink.scala is the
  * write half), plus a [[TableCatalog]] that makes the format reachable
  * from SQL with genuine time travel:
  *
  *   - every commit is an immutable snapshot `_MANIFEST.v<N>` claimed
  *     by atomic putIfAbsent with rebase-on-conflict (publishSnapshot);
  *     reads resolve "latest" from the newest COMPLETE version file
  *     (latestComplete — the `_MANIFEST`/`_SCHEMA` pointers are
  *     best-effort probes), or pin a version via
  *     `.option("versionAsOf", n)` / SQL `VERSION AS OF n` /
  *     `TIMESTAMP AS OF t` through the catalog
  *     (`TableCatalog.loadTable(ident, version)` — the same seam
  *     Delta/Iceberg plug; reference has no table-format concept, its
  *     tables are directories, `sql/core/.../datasources/DataSource
  *     .scala:355` resolveRelation).
  *   - scans list ONLY manifest-listed files (never the directory), so
  *     readers can't observe a torn commit; one InputPartition per data
  *     file; column pruning via SupportsPushDownRequiredColumns parses
  *     only requested fields.
  *
  * Register: `spark.sql.catalog.<name> = graft.sources.GraftManifestCatalog`
  * and `spark.sql.catalog.<name>.root = <dir>`; each table is the
  * subdirectory `<root>/<table>` written by `graft-manifest` sink jobs.
  */
object ManifestFiles {

  def readManifest(fs: FileSystem, manifest: Path): Array[String] =
    if (!fs.exists(manifest)) Array.empty
    else {
      val in = fs.open(manifest)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.split("\n").filter(_.nonEmpty)
    }

  def versions(fs: FileSystem, dir: Path): Seq[Int] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("_MANIFEST.v"))
      .flatMap(n => n.stripPrefix("_MANIFEST.v").toIntOption)

  def latestVersion(fs: FileSystem, dir: Path): Int =
    (0 +: versions(fs, dir)).max

  /** Newest version whose `_SCHEMA.v<N>` has also landed — the claim
    * (`_MANIFEST.v<N>`) precedes the schema by an instant, so readers
    * resolving "latest" skip an incomplete tip instead of blocking.
    * Version files, not the `_MANIFEST`/`_SCHEMA` pointers, are the
    * source of truth: under concurrent commits the pointers can lag or
    * even regress briefly (last swing wins); version files cannot. */
  def latestComplete(fs: FileSystem, dir: Path): Int =
    (0 +: versions(fs, dir).filter(v =>
      fs.exists(new Path(dir, s"_SCHEMA.v$v")))).max

  /** Latest version whose snapshot file existed at `tsMicros` (commit
    * time = the version file's modification time). */
  def versionAt(fs: FileSystem, dir: Path, tsMicros: Long): Option[Int] =
    versions(fs, dir)
      .filter(v => fs.getFileStatus(new Path(dir, s"_MANIFEST.v$v"))
        .getModificationTime * 1000L <= tsMicros)
      .maxOption

  def entries(fs: FileSystem, dir: Path, version: Option[Int]): Array[(String, Long)] = {
    val manifest = version match {
      case Some(v) =>
        val p = new Path(dir, s"_MANIFEST.v$v")
        require(fs.exists(p), s"no version $v at $dir " +
          s"(have: ${versions(fs, dir).sorted.mkString(",")})")
        p
      case None =>
        val v = latestComplete(fs, dir)
        if (v > 0) new Path(dir, s"_MANIFEST.v$v")
        else new Path(dir, "_MANIFEST")
    }
    // `#`-prefixed lines are snapshot metadata (e.g. `#txn,<query>,<epoch>`
    // streaming transaction markers), not file entries.
    readManifest(fs, manifest).filterNot(_.startsWith("#")).map { line =>
      val i = line.lastIndexOf(',')
      (line.substring(0, i), line.substring(i + 1).toLong)
    }
  }

  /** Raw lines of the newest complete snapshot (file entries AND
    * `#`-metadata lines) — what a commit's rebase starts from. */
  def latestLines(fs: FileSystem, dir: Path): Array[String] = {
    val v = latestComplete(fs, dir)
    if (v <= 0) Array.empty
    else readManifest(fs, new Path(dir, s"_MANIFEST.v$v"))
  }

  /** Highest epoch a streaming query has committed into this table, read
    * from the snapshot's `#txn` markers (the Delta SetTransaction idea:
    * the marker rides the atomically-claimed version file, so epoch
    * dedup survives any crash point). */
  def committedEpoch(lines: Array[String], queryId: String): Option[Long] =
    lines.filter(_.startsWith(s"#txn,$queryId,"))
      .flatMap(_.split(",", 3).lift(2)).flatMap(_.toLongOption).maxOption

  /** Publish one snapshot with OPTIMISTIC CONCURRENCY (the Delta/Iceberg
    * commit protocol): claim version N by rename-without-overwrite of a
    * fully-written temp file (atomic putIfAbsent on HDFS-semantics
    * filesystems; on a raw local FS the existence check narrows the race
    * to microseconds), and — crucially — REBUILD the snapshot from the
    * just-lost winner's entries on every retry, so a concurrent
    * committer's files are never dropped from the merged snapshot (no
    * lost updates). `buildEntries` receives the predecessor snapshot's
    * lines and returns this commit's full entry list. `_SCHEMA.v<N>`
    * lands after the claim; the latest pointers swing last via atomic
    * overwrite-rename (they are a convenience — version files are the
    * source of truth, see latestVersion). Returns the claimed version. */
  def publishSnapshot(fs: FileSystem, conf: org.apache.hadoop.conf.Configuration,
      dir: Path, buildEntries: Array[String] => Array[String],
      schema: StructType): Int = {
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, conf)
    // Temp names carry a committer-unique token: two committers racing
    // for the same version number must stage to DIFFERENT temp files.
    val token = java.util.UUID.randomUUID().toString.take(8)
    // The CLAIM must go through FileSystem.rename, not FileContext: it
    // refuses an existing destination natively (atomic putIfAbsent on
    // HDFS semantics) AND ChecksumFileSystem moves the data+crc sidecar
    // pair coherently — FileContext's pair-unaware rename let a losing
    // claimer clobber the winner's .crc, corrupting the version file
    // for every reader. Pointer swings still use FileContext's
    // overwrite-rename; pointers are an existence probe only (version
    // files are the read path), so their last-swing-wins race is benign.
    def land(tmpName: String, bytes: Array[Byte], target: String,
        overwrite: Boolean): Boolean = {
      val tmp = new Path(dir, tmpName)
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      if (overwrite) {
        // Best-effort: FileContext's OVERWRITE is delete-then-rename
        // internally, so concurrent swingers can race each other into a
        // spurious already-exists. Losing the swing is fine — some
        // committer's complete snapshot is the pointer either way.
        try {
          fc.rename(tmp, new Path(dir, target),
            org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        } catch {
          case _: java.io.IOException => fs.delete(tmp, false)
        }
        true
      } else {
        val ok =
          try fs.rename(tmp, new Path(dir, target))
          catch { case _: java.io.IOException => false }
        if (!ok) fs.delete(tmp, false)
        ok
      }
    }

    // POSIX rename overwrites silently, so on a LOCAL filesystem the
    // exists-check + rename pair is not atomic across threads — a raw
    // race let two claimers both "succeed" with one snapshot silently
    // replaced. Same-process committers (local mode, one driver JVM)
    // therefore serialize on a lock keyed by the table directory —
    // Delta's LocalLogStore makes the same tradeoff. On HDFS-semantics
    // filesystems rename refuses an existing destination server-side,
    // so CROSS-process committers are safe where it matters (shared
    // production storage); cross-process writers on one raw local disk
    // remain a documented out-of-scope race.
    val lock = (dir.toUri.toString + "#graft-manifest-claim").intern()
    lock.synchronized {
      var version = latestVersion(fs, dir) + 1
      var entries: Array[Byte] = null
      var claimed = false
      while (!claimed) {
        val previous =
          if (version <= 1) Array.empty[String]
          else readManifest(fs, new Path(dir, s"_MANIFEST.v${version - 1}"))
        entries = buildEntries(previous).sorted.mkString("\n").getBytes("UTF-8")
        claimed = !fs.exists(new Path(dir, s"_MANIFEST.v$version")) &&
          land(s"._claim-$token-$version", entries, s"_MANIFEST.v$version",
            overwrite = false)
        if (!claimed) version += 1
      }
      val schemaBytes = schema.json.getBytes("UTF-8")
      land(s"._publish-$token-vschema", schemaBytes, s"_SCHEMA.v$version",
        overwrite = true)
      land(s"._publish-$token-lschema", schemaBytes, "_SCHEMA", overwrite = true)
      land(s"._publish-$token-lmanifest", entries, "_MANIFEST", overwrite = true)
      version
    }
  }

  /** Entries ADDED between two snapshot versions (the incremental-read
    * set difference, shared by the streaming source and the batch
    * `changesFrom`/`changesTo` options). Fails loudly when the range is
    * not pure appends — a COW rewrite inside the range would otherwise
    * surface rewritten rows as if they were new data. */
  def addedBetween(fs: FileSystem, dir: Path, from: Int, to: Int): Array[String] = {
    def names(v: Int): Set[String] =
      if (v <= 0) Set.empty else entries(fs, dir, Some(v)).map(_._1).toSet
    val before = names(from)
    val after = names(to)
    val removed = before -- after
    if (removed.nonEmpty) throw new IllegalStateException(
      s"graft-manifest at $dir: versions $from..$to are not pure " +
        s"appends (${removed.size} entries unlisted, e.g. ${removed.head}); " +
        "incremental reads require append-only history")
    (after -- before).toArray.sorted
  }

  def schemaFor(fs: FileSystem, dir: Path, version: Option[Int]): StructType = {
    version.foreach { v =>
      require(fs.exists(new Path(dir, s"_MANIFEST.v$v")),
        s"no version $v at $dir " +
          s"(have: ${versions(fs, dir).sorted.mkString(",")})")
    }
    val p = version.map(v => new Path(dir, s"_SCHEMA.v$v")).getOrElse {
      val v = latestComplete(fs, dir)
      if (v > 0) new Path(dir, s"_SCHEMA.v$v") else new Path(dir, "_SCHEMA")
    }
    require(fs.exists(p), s"graft-manifest: no schema file at $p — " +
      "was this directory written by the graft-manifest sink?")
    val in = fs.open(p)
    val json =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    DataType.fromJson(json).asInstanceOf[StructType]
  }
}

private[sources] class ManifestScanBuilder(path: String, version: Option[Int],
    fullSchema: StructType, conf: SerializableHadoopConf,
    onPlanned: Array[String] => Unit = _ => (),
    // Batch incremental read (`changesFrom` → exclusive, `changesTo` →
    // inclusive, default latest): the rows commits ADDED in the version
    // range — the backfill twin of the streaming source.
    changes: Option[(Int, Option[Int])] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch
      with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
    // Runtime group filter (row-level COPY_ON_WRITE plans): Spark's
    // group-filtering subquery collects the `_file` values containing
    // matches and hands them back here, so only affected files are
    // scanned — and therefore only affected files get rewritten.
    @volatile private var allowedFiles: Option[Set[String]] = None

    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-manifest $path${version.map(v => s" v$v").getOrElse("")}"

    override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("_file"))

    override def filter(
        predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
      def refsFile(e: org.apache.spark.sql.connector.expressions.Expression): Boolean = e match {
        case r: org.apache.spark.sql.connector.expressions.NamedReference =>
          r.fieldNames.sameElements(Array("_file"))
        case other => other.children.exists(refsFile)
      }
      def literals(e: org.apache.spark.sql.connector.expressions.Expression): Seq[String] = e match {
        case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
          Seq(String.valueOf(l.value))
        case other => other.children.toSeq.flatMap(literals)
      }
      predicates.filter(refsFile).foreach { p =>
        val vals = literals(p).toSet
        allowedFiles = Some(allowedFiles.fold(vals)(_ intersect vals))
      }
    }

    override def planInputPartitions(): Array[InputPartition] = {
      val dir = new Path(path)
      val fs = dir.getFileSystem(conf.value)
      val listed = changes match {
        case Some((from, to)) =>
          ManifestFiles.addedBetween(fs, dir, from,
            to.getOrElse(ManifestFiles.latestComplete(fs, dir)))
        case None => ManifestFiles.entries(fs, dir, version).map(_._1)
      }
      val names = allowedFiles.fold(listed)(ok => listed.filter(ok))
      onPlanned(names)
      names.map(n =>
        ManifestInputPartition(new Path(dir, n).toString, n)).toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new ManifestReaderFactory(fullSchema, required, conf)

    override def toMicroBatchStream(checkpointLocation: String):
        org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      new ManifestMicroBatchStream(path, fullSchema, required, conf)
  }
}

/** Streaming read of the manifest table (the Delta streaming-source
  * pattern): an OFFSET IS A SNAPSHOT VERSION. Each micro-batch covers
  * the manifest entries added between two versions — set difference by
  * name, so a batch reads exactly the files new commits published,
  * never rescanning history. Restarts resume from the engine-persisted
  * version offset. Non-append history (a COPY_ON_WRITE delete/update/
  * merge or an overwrite unlisted files between the offsets) fails the
  * batch explicitly rather than silently re-emitting rewritten rows —
  * the same contract Delta's streaming source defaults to. */
private[sources] case class ManifestOffset(version: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = version.toString
}

private[sources] class ManifestMicroBatchStream(path: String,
    fullSchema: StructType, required: StructType, conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def dir = new Path(path)
  private def fs = dir.getFileSystem(conf.value)

  override def initialOffset(): Offset = ManifestOffset(0)
  override def latestOffset(): Offset =
    ManifestOffset(ManifestFiles.latestVersion(fs, dir))
  override def deserializeOffset(json: String): Offset =
    ManifestOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ManifestOffset].version
    val e = end.asInstanceOf[ManifestOffset].version
    ManifestFiles.addedBetween(fs, dir, s, e).map(n =>
      ManifestInputPartition(new Path(dir, n).toString, n): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(fullSchema, required, conf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class ManifestInputPartition(file: String, name: String)
  extends InputPartition

private[sources] class ManifestReaderFactory(fullSchema: StructType,
    required: StructType, conf: SerializableHadoopConf)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ManifestInputPartition]
    val file = new Path(part.file)
    val fs = file.getFileSystem(conf.value)
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(file), "UTF-8"))
    // CSV column i of each line ↔ fullSchema(i); parse only required.
    // Index -1 = the `_file` metadata column (this partition's manifest
    // entry name — the group identity row-level COW plans join on).
    val picks: Array[(Int, DataType)] = required.fields.map { f =>
      if (f.name == "_file") (-1, StringType)
      else (fullSchema.fieldIndex(f.name), f.dataType)
    }
    val fileName = UTF8String.fromString(part.name)
    new PartitionReader[InternalRow] {
      private var line: String = _
      override def next(): Boolean = { line = reader.readLine(); line != null }
      override def get(): InternalRow = {
        val cols = splitCsv(line, fullSchema.length)
        val out = new GenericInternalRow(picks.length)
        var i = 0
        while (i < picks.length) {
          val (src, dt) = picks(i)
          // src beyond the row's arity = a column added by ALTER TABLE
          // after this file was written — old rows surface NULL.
          out.update(i,
            if (src == -1) fileName
            else if (src >= cols.length) null
            else parse(cols(src), dt))
          i += 1
        }
        out
      }
      override def close(): Unit = reader.close()
    }
  }

  /** The sink joins String.valueOf(field) with ','. Only the LAST field
    * could legally contain commas in our payloads (we refuse string
    * fields elsewhere at parse if the shape is off), so split at most
    * n-1 times. Caveat after ALTER TABLE ADD COLUMN: `n` is the CURRENT
    * arity, so a pre-evolution file whose last string field contained
    * commas would over-split — comma-bearing last fields and schema
    * evolution don't mix (documented limitation of the CSV payload). */
  private def splitCsv(line: String, n: Int): Array[String] =
    line.split(",", n)

  private def parse(s: String, dt: DataType): Any = dt match {
    case LongType => s.toLong
    case IntegerType => s.toInt
    case ShortType => s.toShort
    case ByteType => s.toByte
    case DoubleType => s.toDouble
    case FloatType => s.toFloat
    case BooleanType => s.toBoolean
    case StringType => UTF8String.fromString(s)
    case other => throw new UnsupportedOperationException(
      s"graft-manifest read supports primitive column types, got $other")
  }
}

/** `TableCatalog` over a root directory of manifest tables. Provides the
  * SQL entry points — `SELECT ... FROM <cat>.<table>` resolves the
  * latest snapshot, `VERSION AS OF n` / `TIMESTAMP AS OF ts` pin one —
  * by implementing the time-travel `loadTable` overloads. Writes go
  * through the sink (`format("graft-manifest")`); createTable is
  * therefore rejected with a pointer, dropTable removes the directory.
  *
  * Also a [[org.apache.spark.sql.connector.catalog.ProcedureCatalog]]
  * (the `CALL cat.system.proc(...)` seam, Iceberg's maintenance
  * convention) with the table-format lifecycle operations:
  *
  *   - `CALL cat.system.compact('t', target_files)` — read the latest
  *     snapshot, coalesce into `target_files` files, commit as ONE new
  *     snapshot (copy-on-write: a lazy self-read is safe because commit
  *     publishes at job end and data files are never mutated). Small
  *     files are the #1 operational failure of manifest-style tables at
  *     scale — every streaming append adds files forever.
  *   - `CALL cat.system.vacuum('t', retain_versions)` — drop snapshot
  *     files older than the newest `retain_versions` versions, then
  *     delete data files no remaining version references. This is the
  *     ONLY place the format ever deletes data; time travel to vacuumed
  *     versions (and streaming restarts from offsets older than the
  *     horizon) intentionally fail afterwards.
  *   - `CALL cat.system.snapshots('t')` — version history (version,
  *     file/row counts, commit time) as a result set: DESCRIBE HISTORY.
  */
class GraftManifestCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var root: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"catalog $name requires spark.sql.catalog.$name.root=<directory>"))
    root = new Path(r)
  }
  override def name(): String = catalogName

  private def fs: FileSystem =
    root.getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  private def tableDir(ident: Identifier): Path = {
    require(ident.namespace.isEmpty || ident.namespace.sameElements(Array("default")),
      s"catalog $catalogName is flat: use $catalogName.<table>, got $ident")
    new Path(root, ident.name)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val f = fs
    if (!f.exists(root)) Array.empty
    else f.listStatus(root).filter(_.isDirectory)
      .filter(s => f.exists(new Path(s.getPath, "_MANIFEST")))
      .map(s => Identifier.of(Array.empty, s.getPath.getName))
  }

  private def load(ident: Identifier, version: Option[Int]): Table = {
    val dir = tableDir(ident)
    val f = fs
    if (!f.exists(new Path(dir, "_MANIFEST")))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName, ident.name))
    val props = new java.util.HashMap[String, String]()
    props.put("path", dir.toString)
    version.foreach(v => props.put("versionAsOf", v.toString))
    new ManifestTable(ManifestFiles.schemaFor(f, dir, version), props,
      strictSchema = true)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toIntOption.getOrElse(
      throw new IllegalArgumentException(
        s"graft-manifest versions are integers, got '$version'"))))

  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tableDir(ident)
    val v = ManifestFiles.versionAt(fs, dir, timestamp).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot of $ident at or before timestamp $timestamp"))
    load(ident, Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft-manifest tables are created by writing with " +
        s"""df.write.format("graft-manifest").option("path", "<root>/<table>")""")

  /** Schema evolution as a METADATA-ONLY commit: `ALTER TABLE ... ADD
    * COLUMN` (appended, nullable — old files read NULL for it via the
    * reader's positional null-fill) and `RENAME COLUMN` (rows are
    * positional, so a rename touches no data) publish a new snapshot
    * with the same entries and the evolved schema. No data rewrite at
    * any scale; the pre-image schema stays version-pinned. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    val f = fs
    if (!f.exists(new Path(dir, "_MANIFEST")))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName, ident.name))
    var schema = ManifestFiles.schemaFor(f, dir, None)
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "graft-manifest: nested columns are not supported")
        require(a.position == null,
          "graft-manifest: added columns always append at the end " +
            "(rows are positional CSV)")
        require(a.isNullable,
          "graft-manifest: added columns must be nullable — existing " +
            "rows surface NULL for them")
        val name = a.fieldNames()(0)
        require(!schema.fieldNames.contains(name), s"column $name exists")
        schema = schema.add(name, a.dataType, nullable = true)
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "graft-manifest: nested columns are not supported")
        val from = r.fieldNames()(0)
        require(schema.fieldNames.contains(from), s"no column $from")
        require(!schema.fieldNames.contains(r.newName),
          s"column ${r.newName} exists")
        schema = StructType(schema.fields.map(fd =>
          if (fd.name == from) fd.copy(name = r.newName) else fd))
      case other => throw new UnsupportedOperationException(
        "graft-manifest supports ADD COLUMN (appended, nullable) and " +
          s"RENAME COLUMN only, got $other")
    }
    ManifestFiles.publishSnapshot(f,
      SparkSession.active.sessionState.newHadoopConf(), dir,
      previous => previous, schema)
    load(ident, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    val f = fs
    f.exists(dir) && f.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("rename not supported")

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType, TimestampType}

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    ManifestProcedures.names.map(n => Identifier.of(Array("system"), n))

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")) &&
      ManifestProcedures.names.contains(ident.name),
      s"unknown procedure $ident — have: " +
        ManifestProcedures.names.map(n => s"$catalogName.system.$n").mkString(", "))
    val dirFor = (t: String) => tableDir(Identifier.of(Array.empty, t))
    ident.name match {
      case "compact" => ManifestProcedures.compact(dirFor)
      case "vacuum" => ManifestProcedures.vacuum(dirFor)
      case "snapshots" => ManifestProcedures.snapshots(dirFor)
    }
  }
}

/** The maintenance procedures themselves. Each is an UnboundProcedure
  * whose `call` runs driver-side metadata work (vacuum/snapshots — file
  * listings scale with file count, not data) or a Spark job (compact)
  * and returns a one-scan result set via [[LocalScan]]. */
private[sources] object ManifestProcedures {
  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.connector.read.{LocalScan, Scan}
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType, TimestampType}
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  val names: Array[String] = Array("compact", "vacuum", "snapshots")

  private def param(n: String, dt: org.apache.spark.sql.types.DataType) =
    ProcedureParameter.in(n, dt).build()
  private def paramDefault(n: String, dt: org.apache.spark.sql.types.DataType,
      default: String) =
    ProcedureParameter.in(n, dt).defaultValue(default).build()

  private def result(schema: StructType, row: Array[Any]): java.util.Iterator[Scan] =
    java.util.List.of[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
        Array(new GenericInternalRow(row))
    }).iterator()

  private def proc(procName: String, params: Array[ProcedureParameter])(
      body: org.apache.spark.sql.catalyst.InternalRow => java.util.Iterator[Scan]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft-manifest $procName"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def description(): String = s"graft-manifest $procName"
        override def parameters(): Array[ProcedureParameter] = params
        override def isDeterministic: Boolean = false
        override def call(input: org.apache.spark.sql.catalyst.InternalRow): java.util.Iterator[Scan] =
          body(input)
      }
    }

  def compact(dirFor: String => Path): UnboundProcedure =
    proc("compact", Array(param("table", StringType),
        paramDefault("target_files", IntegerType, "1"))) { input =>
      val spark = SparkSession.active
      val dir = dirFor(input.getUTF8String(0).toString)
      val target = input.getInt(1)
      require(target >= 1, s"target_files must be >= 1, got $target")
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val before = ManifestFiles.entries(fs, dir, None).length
      spark.read.format("graft-manifest").option("path", dir.toString).load()
        .coalesce(target)
        .write.mode("overwrite").format("graft-manifest")
        .option("path", dir.toString).save()
      val after = ManifestFiles.entries(fs, dir, None).length
      result(new StructType().add("version", IntegerType)
          .add("files_before", IntegerType).add("files_after", IntegerType),
        Array(ManifestFiles.latestVersion(fs, dir), before, after))
    }

  def vacuum(dirFor: String => Path): UnboundProcedure =
    proc("vacuum", Array(param("table", StringType),
        paramDefault("retain_versions", IntegerType, "1"))) { input =>
      val spark = SparkSession.active
      val dir = dirFor(input.getUTF8String(0).toString)
      val retain = input.getInt(1)
      require(retain >= 1, s"retain_versions must be >= 1, got $retain")
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val versions = ManifestFiles.versions(fs, dir).sorted
      val (dropped, kept) = versions.splitAt(math.max(0, versions.length - retain))
      val referenced = kept.flatMap(v =>
        ManifestFiles.entries(fs, dir, Some(v)).map(_._1)).toSet
      dropped.foreach { v =>
        fs.delete(new Path(dir, s"_MANIFEST.v$v"), false)
        fs.delete(new Path(dir, s"_SCHEMA.v$v"), false)
      }
      val removed = fs.listStatus(dir).count { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".") &&
          !referenced.contains(n) && fs.delete(st.getPath, false)
      }
      // Crashed committers leave orphan temp files (`._claim-*` /
      // `._publish-*`); racing a LIVE commit is harmless — its claim
      // retry stages a fresh temp. Not counted as data files.
      fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && (n.startsWith("._claim-") || n.startsWith("._publish-")))
          fs.delete(st.getPath, false)
      }
      result(new StructType().add("versions_dropped", IntegerType)
          .add("data_files_deleted", IntegerType),
        Array(dropped.length, removed))
    }

  def snapshots(dirFor: String => Path): UnboundProcedure =
    proc("snapshots", Array(param("table", StringType))) { input =>
      val spark = SparkSession.active
      val dir = dirFor(input.getUTF8String(0).toString)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val schema = new StructType().add("version", IntegerType)
        .add("files", IntegerType).add("rows", LongType)
        .add("committed_at", TimestampType)
      val history = ManifestFiles.versions(fs, dir).sorted.map { v =>
        val es = ManifestFiles.entries(fs, dir, Some(v))
        new GenericInternalRow(Array[Any](v, es.length, es.map(_._2).sum,
          fs.getFileStatus(new Path(dir, s"_MANIFEST.v$v"))
            .getModificationTime * 1000L)): org.apache.spark.sql.catalyst.InternalRow
      }.toArray
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] = history
      }).iterator()
    }
}
