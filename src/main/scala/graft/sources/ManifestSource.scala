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
  *   - every commit is an immutable snapshot `_MANIFEST.v<N>`; reads
  *     resolve "latest" through the atomically-published `_MANIFEST`
  *     pointer, or pin a version via `.option("versionAsOf", n)` /
  *     SQL `VERSION AS OF n` / `TIMESTAMP AS OF t` through the catalog
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

  private def versionsOf(fs: FileSystem, dir: Path): Seq[Int] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("_MANIFEST.v"))
      .flatMap(n => n.stripPrefix("_MANIFEST.v").toIntOption)

  def latestVersion(fs: FileSystem, dir: Path): Int =
    (0 +: versionsOf(fs, dir)).max

  /** Latest version whose snapshot file existed at `tsMicros` (commit
    * time = the version file's modification time). */
  def versionAt(fs: FileSystem, dir: Path, tsMicros: Long): Option[Int] =
    versionsOf(fs, dir)
      .filter(v => fs.getFileStatus(new Path(dir, s"_MANIFEST.v$v"))
        .getModificationTime * 1000L <= tsMicros)
      .maxOption

  def entries(fs: FileSystem, dir: Path, version: Option[Int]): Array[(String, Long)] = {
    val manifest = version match {
      case Some(v) =>
        val p = new Path(dir, s"_MANIFEST.v$v")
        require(fs.exists(p), s"no version $v at $dir " +
          s"(have: ${versionsOf(fs, dir).sorted.mkString(",")})")
        p
      case None => new Path(dir, "_MANIFEST")
    }
    readManifest(fs, manifest).map { line =>
      val i = line.lastIndexOf(',')
      (line.substring(0, i), line.substring(i + 1).toLong)
    }
  }

  def schemaFor(fs: FileSystem, dir: Path, version: Option[Int]): StructType = {
    version.foreach { v =>
      require(fs.exists(new Path(dir, s"_MANIFEST.v$v")),
        s"no version $v at $dir " +
          s"(have: ${versionsOf(fs, dir).sorted.mkString(",")})")
    }
    val p = version.map(v => new Path(dir, s"_SCHEMA.v$v"))
      .getOrElse(new Path(dir, "_SCHEMA"))
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
    onPlanned: Array[String] => Unit = _ => ())
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
      val listed = ManifestFiles.entries(fs, dir, version).map(_._1)
      val names = allowedFiles.fold(listed)(ok => listed.filter(ok))
      onPlanned(names)
      names.map(n =>
        ManifestInputPartition(new Path(dir, n).toString, n)).toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new ManifestReaderFactory(fullSchema, required, conf)
  }
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
          out.update(i, if (src == -1) fileName else parse(cols(src), dt))
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
    * n-1 times. */
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
  * therefore rejected with a pointer, dropTable removes the directory. */
class GraftManifestCatalog extends TableCatalog {

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

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft-manifest tables are immutable snapshots")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    val f = fs
    f.exists(dir) && f.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("rename not supported")
}
