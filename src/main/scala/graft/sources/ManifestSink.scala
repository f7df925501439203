package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, DateType, DecimalType, DoubleType, FloatType, IntegerType, LongType, MetadataBuilder, ShortType, StringType, StructField, StructType, TimestampNTZType, TimestampType}
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
  *     task committed — moves the staged files up and then publishes the
  *     snapshot through `ManifestFiles.publishSnapshot` (atomic version
  *     claim + rebase-on-conflict; the version file is the single atomic
  *     publish point). A driver crash mid-commit can leave part files
  *     visible to directory listing, so READERS MUST TRUST ONLY
  *     MANIFEST-LISTED FILES (the `_spark_metadata` idea); the spec
  *     reads through the manifest.
  *   - `BatchWrite.abort` removes this job's staging namespace only.
  *
  * All I/O goes through the Hadoop `FileSystem` API resolved from the
  * session's Hadoop configuration (serialized to executors the way
  * FileFormatWriter ships its job conf), so any `fs.*` scheme works —
  * local paths in tests, HDFS/object stores in production. Rows land as
  * PARQUET by default (round 11 — Spark's own ParquetWriteSupport /
  * VectorizedParquetRecordReader, see ManifestParquet.scala);
  * `option("format", "csv")` keeps the legacy line payload, and format
  * is a per-file property so mixed-history tables read fine.
  * `failPartition` injects a first-attempt task failure for
  * ManifestSinkSpec's abort/atomicity proofs. Usage:
  * `df.write.format("graft-manifest").option("path", p)`.
  *
  * Since round 8 every commit is additionally an immutable VERSIONED
  * snapshot (`_MANIFEST.v<N>` + `_SCHEMA.v<N>`): append merges the prior
  * snapshot, `mode("overwrite")` truncates, and ManifestSource.scala
  * provides the batch READ path plus a TableCatalog with `VERSION AS
  * OF`/`TIMESTAMP AS OF` SQL over those snapshots.
  */
private[sources] object ManifestSink {
  /** The data-file name a snapshot line refers to: a data entry's name
    * prefix, a `#stats` line's second field, none for other metadata
    * (`#txn` markers never match a dropped file). Lets COPY_ON_WRITE
    * commits drop a rewritten file's STATS line together with its entry. */
  def entryName(line: String): Option[String] =
    if (line.startsWith("#stats,")) line.split(",", 4).lift(1)
    else if (line.startsWith("#bucket,") || line.startsWith("#sorted,"))
      line.split(",", 3).lift(1) // drop layout marks with their entry
    else if (line.startsWith("#import,") || line.startsWith("#born,") ||
        line.startsWith("#ndv,") || line.startsWith("#firstrow,") ||
        line.startsWith("#ridcol,") || line.startsWith("#luv,") ||
        line.startsWith("#luvcol,") || line.startsWith("#hist,"))
      line.split(",", 3).lift(1) // name maps / birth marks / sketches /
                                 // lineage + histogram riders travel
                                 // with their file
    else if (line.startsWith("#")) None
    else Some(line.substring(0, line.lastIndexOf(',')))

  /** Split a snapshot's entries by how the ANDed `filters` relate to
    * each file's stats: (provably all-match, provably none-match,
    * undecidable). Metadata-only DELETE requires the third set empty. */
  def partitionByMatch(filters: Array[org.apache.spark.sql.sources.Filter],
      schema: StructType, lines: Array[String]):
      (Set[String], Set[String], Seq[String]) = {
    val entries = ManifestFiles.entriesFromLines(lines)
    val stats = ManifestFiles.statsFromLines(lines)
    // float→double WIDENED columns: their text-stored bounds re-decode
    // to DIFFERENT doubles than the rows' upcast values, so neither
    // all-match nor no-match is provable from them — a filter touching
    // one sends every file to `mixed` (the COW rewrite path, which
    // evaluates real rows; cost, never wrongness). Same suppression the
    // scan's statsSafeFilters applies.
    val widenedFloat: Set[String] = ManifestFiles.widenedFromLines(lines)
      .collect { case (pos, "float") => pos }
      .flatMap(p => ManifestFiles.fieldAtPhys(schema, p))
      .map(schema(_).name).toSet
    def statsSafe(f: org.apache.spark.sql.sources.Filter): Boolean =
      widenedFloat.isEmpty || !f.references.exists(widenedFloat.contains)
    // DELETE's condition arrives as a conjunction
    val all = scala.collection.mutable.Set.empty[String]
    val none = scala.collection.mutable.Set.empty[String]
    val mixed = scala.collection.mutable.ArrayBuffer.empty[String]
    entries.foreach { case (n, rows) =>
      val st = stats.get(n)
      if (filters.nonEmpty && filters.forall(f => statsSafe(f) &&
          ManifestSkip.provesAllMatch(f, schema, st, Some(rows)))) all += n
      else if (filters.exists(f => statsSafe(f) &&
          ManifestSkip.canSkip(f, schema, st, Some(rows)))) none += n
      else mixed += n
    }
    (all.toSet, none.toSet, mixed.toSeq)
  }
}

class ManifestSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-manifest"
  override def supportsExternalMetadata(): Boolean = true
  // Read path: the schema was published at commit time (`_SCHEMA[.vN]`),
  // so "inference" is a lookup, never a data scan. Write path to a fresh
  // directory: nothing there yet — empty schema, the writer's df schema
  // arrives via getTable.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("path")).map { p =>
      val dir = new Path(p)
      val fs = dir.getFileSystem(
        SparkSession.active.sessionState.newHadoopConf())
      if (fs.exists(new Path(dir, "_SCHEMA"))) {
        val base = ManifestFiles.schemaFor(fs, dir,
          Option(options.get("versionAsOf"))
            .map(ManifestFiles.resolveVersionStr(fs, dir, _)),
          Option(options.get("branch")))
        // change-feed reads surface the table's columns PLUS the
        // _change_type/_commit_version constants — and on row-lineage
        // tables, each leg's `_row_id` (COW rewrites PRESERVE ids, so
        // update legs pair on pure identity with no business key). The
        // gpos=-1 marker keeps the appended field out of the physical-
        // position namespace (it is computed, never stored positionally).
        if (Option(options.get("changeFeed")).exists(_.toBoolean)) {
          // IO failures PROPAGATE (round-15 advice): quietly deciding
          // "not lineage" on a transient FS error would drop _row_id
          // from the CDF schema — the silent-corruption mode the
          // isLineageAt policy exists to prevent. An empty chain reads
          // as Array.empty → false, the one legitimate no-lineage case.
          val lineage =
            ManifestFiles.isLineage(ManifestFiles.latestLines(fs, dir))
          val withRid =
            if (!lineage) base
            else base.add(StructField("_row_id",
              org.apache.spark.sql.types.LongType, nullable = true,
              new MetadataBuilder().putLong("gpos", -1L).build()))
              .add(StructField("_last_updated_version",
                org.apache.spark.sql.types.IntegerType, nullable = true,
                new MetadataBuilder().putLong("gpos", -1L).build()))
          ManifestChangeFeed.outputSchema(withRid)
        } else base
      } else new StructType()
    }.getOrElse(new StructType())
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ManifestTable(schema, properties)
}

/** Hadoop Configuration is not java-serializable; ship it to the task
  * writers via Writable round-trip (the same trick Spark's own
  * SerializableConfiguration uses — that class is private[spark]).
  *
  * Deserialization is CONTENT-DEDUPED per JVM: Spark hands every task
  * its own copy of the stage's task binary, so without the cache every
  * scan/write task re-parsed the ~1000-property Configuration —
  * executor profiling showed that single readFields as the hottest
  * manifest-task frame (it beat the actual parquet work on small
  * files). Tasks treat the shipped conf as read-only (driver-side
  * mutations like setBloomCols happen before serialization), so all
  * tasks of all stages can share one parsed instance per unique
  * content; Configuration reads are synchronized internally. */
private[sources] object SerializableHadoopConf {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Configuration]
  // every distinct session-conf content is a new key (catalog
  // registrations ride the serialized conf), so bound the cache for
  // long-lived multi-tenant drivers: a rare full clear only costs the
  // next task of each stage one re-parse
  private val MaxEntries = 256

  /** STRUCTURAL read-only enforcement (round-16 advice item): every
    * task in the JVM shares one parsed instance per content, which is
    * sound only while nobody mutates it. Every Hadoop setter funnels
    * through 3-arg `set` (setInt/setBoolean/… call set(String,String)
    * which calls this) or `unset`, so freezing those two after the
    * deserializing readFields makes a future task-side mutation fail
    * fast at the write site instead of silently corrupting unrelated
    * concurrent queries. Driver-side mutations (setBloomCols etc.)
    * happen on the ORIGINAL conf before serialization, never on this
    * shared parse. */
  private[sources] final class FrozenConfiguration
      extends Configuration(false) {
    private var frozen = false
    def freeze(): Unit = frozen = true
    override def set(name: String, value: String, source: String): Unit = {
      if (frozen) throw new UnsupportedOperationException(
        s"task-shared Hadoop Configuration is read-only (set '$name') — " +
          "copy it (new Configuration(conf)) before mutating")
      super.set(name, value, source)
    }
    override def unset(name: String): Unit = {
      if (frozen) throw new UnsupportedOperationException(
        s"task-shared Hadoop Configuration is read-only (unset '$name') — " +
          "copy it (new Configuration(conf)) before mutating")
      super.unset(name)
    }
  }

  private def parsed(bytes: Array[Byte]): Configuration = {
    val key = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
      java.util.Base64.getEncoder.encodeToString(d.digest(bytes))
    }
    if (cache.size > MaxEntries) cache.clear()
    cache.computeIfAbsent(key, _ => {
      val c = new FrozenConfiguration
      c.readFields(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      c.freeze()
      c
    })
  }
}

private[sources] class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    value.write(dos)
    dos.flush()
    val bytes = bos.toByteArray
    out.writeInt(bytes.length)
    out.write(bytes)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    val bytes = new Array[Byte](in.readInt())
    in.readFully(bytes)
    value = SerializableHadoopConf.parsed(bytes)
  }
}

private[sources] object ManifestTable {
  /** Can data of type `from` land in a column declared `to`? Exact type
    * match with nullability TIGHTENING allowed at every nesting level
    * (Spark's `equalsIgnoreCompatibleNullability`, re-stated here — the
    * original is private[sql]). Needed because the optimizer strips a
    * no-op loosening cast: an `array(col)` of non-null elements arrives
    * as `array<t> (containsNull=false)` for an `ARRAY<t>` column, which
    * is a perfectly safe write. The loose direction (nullable data into
    * a non-null slot) stays refused. Nested struct field NAMES must
    * match the table schema — rows bind to nested storage positions
    * through it (storage names are positional at every level since the
    * round-12 nested evolution); top-level names are positional and not
    * compared here. */
  /** Everything-nullable copy of a schema (StructType.asNullable is
    * private[spark]) — the first write to a fresh table publishes this,
    * so incidental non-nullability in the first DF never rejects later
    * appends (Spark's own file sinks normalize the same way). */
  def nullableSchema(st: StructType): StructType =
    StructType(st.fields.map(f =>
      f.copy(dataType = nullableType(f.dataType), nullable = true)))

  private def nullableType(dt: DataType): DataType = dt match {
    case s: StructType => nullableSchema(s)
    case org.apache.spark.sql.types.ArrayType(et, _) =>
      org.apache.spark.sql.types.ArrayType(nullableType(et), true)
    case org.apache.spark.sql.types.MapType(k, v, _) =>
      org.apache.spark.sql.types.MapType(nullableType(k), nullableType(v), true)
    case o => o
  }

  def writeCompatible(from: DataType, to: DataType): Boolean = (from, to) match {
    case (org.apache.spark.sql.types.ArrayType(f, fn),
          org.apache.spark.sql.types.ArrayType(t, tn)) =>
      (tn || !fn) && writeCompatible(f, t)
    case (org.apache.spark.sql.types.MapType(fk, fv, fn),
          org.apache.spark.sql.types.MapType(tk, tv, tn)) =>
      (tn || !fn) && writeCompatible(fk, tk) && writeCompatible(fv, tv)
    case (f: StructType, t: StructType) =>
      f.length == t.length && f.fields.zip(t.fields).forall { case (ff, tf) =>
        ff.name == tf.name && (tf.nullable || !ff.nullable) &&
          writeCompatible(ff.dataType, tf.dataType)
      }
    case (f, t) => f == t
  }
}

private[sources] class ManifestTable(schema0: StructType,
    properties: JMap[String, String],
    // Catalog-resolved tables always carry the published `_SCHEMA`, so
    // they use Spark's strict output resolution — required for row-level
    // command alignment (ACCEPT_ANY_SCHEMA sets skipSchemaResolution,
    // which leaves UpdateTable/MergeIntoTable unaligned and unrewritable).
    // Path-based writes keep ACCEPT_ANY_SCHEMA: a fresh directory infers
    // an empty schema that strict resolution would refuse to write to.
    strictSchema: Boolean = false)
    extends Table with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsDelete {
  override def name(): String = "graft_manifest_sink"
  override def schema(): StructType = schema0
  // surface the catalog-resolved properties (format, delete.mode,
  // bloom.columns, layout) for DESCRIBE EXTENDED / SHOW TBLPROPERTIES
  override def properties(): JMap[String, String] = properties0
  private def properties0: JMap[String, String] = properties

  /** This table pinned to a BRANCH head (SQL `VERSION AS OF 'branch'`):
    * same directory, the branch chain's schema, and a `branch` property
    * the scan builder routes on. */
  private[sources] def withBranch(b: String): ManifestTable = {
    val p = new java.util.HashMap[String, String](properties)
    p.put("branch", b)
    val dir = new Path(properties.get("path"))
    val fs = dir.getFileSystem(
      SparkSession.active.sessionState.newHadoopConf())
    new ManifestTable(
      ManifestFiles.schemaFor(fs, dir, None, Some(b)), p, strictSchema = true)
  }

  // Declared layout surfaced for introspection (DESCRIBE/SHOW CREATE):
  // the catalog's load() passes bucket/partition props from the
  // `#tableconf` lines; SPJ itself rides the Scan's outputPartitioning.
  override def partitioning(): Array[Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    val bucket = for {
      c <- Option(properties.get("bucketBy"))
      n <- Option(properties.get("buckets"))
    } yield Expressions.bucket(n.toInt, c)
    val part = for {
      cs <- Option(properties.get("partitionBy")).map(_.split(",").toSeq)
      ks <- Option(properties.get("partitionKind")).map(_.split(",").toSeq)
      if cs.length == ks.length
    } yield cs.zip(ks).map {
      case (c, "days") => Expressions.days(c)
      case (c, "months") => Expressions.months(c)
      case (c, _) => Expressions.identity(c)
    }
    (bucket.toSeq ++ part.toSeq.flatten).toArray
  }

  // ---- METADATA-ONLY DELETE (SupportsDelete; Iceberg's partition-
  // aligned delete generalized to stats-aligned): when every file either
  // provably ALL-matches the predicate (ManifestSkip.provesAllMatch) or
  // provably NONE-match (canSkip), the DELETE is a pure snapshot edit —
  // drop the all-match entries, write nothing. Spark's
  // OptimizeMetadataOnlyDeleteFromTable asks canDeleteWhere first and
  // falls back to the row-level plan (COW or MOR) on false, so
  // misaligned deletes keep exact row semantics automatically. At
  // 100 TB this is how `DELETE WHERE day < retention` stays O(metadata).
  private def tablePath: Option[String] = Option(properties.get("path"))

  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    tablePath.exists { p =>
      val dir = new Path(p)
      val fs = dir.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
      val lines = ManifestFiles.latestLines(fs, dir)
      ManifestSink.partitionByMatch(filters, schema0, lines)._3.isEmpty
    }

  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val p = tablePath.getOrElse(throw new IllegalArgumentException(
      "graft-manifest metadata delete needs a table path"))
    val dir = new Path(p)
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val fs = dir.getFileSystem(conf)
    ManifestFiles.publishSnapshot(fs, conf, dir, previous => {
      // Re-prove against the CLAIM-TIME predecessor: a commit that
      // landed between canDeleteWhere and here may have broken the
      // alignment — failing loudly beats deleting rows approximately.
      val (drop, _, mixed) =
        ManifestSink.partitionByMatch(filters, schema0, previous)
      if (mixed.nonEmpty) throw new IllegalStateException(
        s"graft-manifest metadata delete: concurrent commit broke " +
          s"predicate/file alignment (e.g. ${mixed.head}); retry the DELETE")
      previous.filterNot(line =>
        ManifestSink.entryName(line).exists(drop.contains))
    }, schema0)
  }

  // `_file` = the manifest entry name a row came from; `_pos` = the
  // row's ordinal within that file. Both user-queryable metadata
  // columns; together they are the group identity for copy-on-write
  // plans (`_file`) and the ROW identity for merge-on-read delta plans
  // (`_file`, `_pos`).
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_file"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StringType
        override def isNullable: Boolean = false
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_pos"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.LongType
        override def isNullable: Boolean = false
      },
      // ROW LINEAGE (round 14): the row's stable identity across
      // compaction / Z-order / copy-on-write rewrites — NULL on tables
      // that never enabled `row.lineage`
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_row_id"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.LongType
        override def isNullable: Boolean = true
      },
      // `_last_updated_version` (round 15 — Iceberg v3's second lineage
      // field): the commit version that last WROTE this row. The
      // preservation contract is Spark's own metadata seam
      // (MetadataColumn.PRESERVE_ON_UPDATE): row-level UPDATE/MERGE
      // plans NULLIFY the carried value for updated rows — they resolve
      // to the rewriting commit's version — while copied rows keep
      // theirs; maintenance rewrites (compact/Z-order) materialize
      // everything verbatim, so maintenance never reads as an update.
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_last_updated_version"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.IntegerType
        override def isNullable: Boolean = true
        override def metadataInJSON(): String =
          s"""{"${org.apache.spark.sql.connector.catalog.MetadataColumn
            .PRESERVE_ON_UPDATE}": false,
              "${org.apache.spark.sql.connector.catalog.MetadataColumn
            .PRESERVE_ON_REINSERT}": false}"""
      })

  // DELETE FROM / UPDATE / MERGE INTO, group-based COPY_ON_WRITE (the
  // same DSv2 seam Iceberg plugs): Spark plans a ReplaceData — scan the
  // affected files through the operation's scan (runtime-group-filtered
  // on `_file`, so untouched files never rescan or rewrite), recompute
  // their surviving rows, and commit replaces exactly those files with
  // the rewrite. Each operation is one new snapshot; the pre-image stays
  // reachable via time travel.
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo):
      org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-manifest row-level operations need the table resolved " +
          "through GraftManifestCatalog (no path property present)"))
    // merge-on-read tables (`TBLPROPERTIES('delete.mode'='merge-on-read')`)
    // take the DELTA path: positional delete files instead of rewriting
    // whole data files (ManifestDelta.scala)
    if (Option(properties.get("delete.mode")).contains("merge-on-read"))
      () => new ManifestDeltaOperation(info.command(), path, schema0,
        Option(properties.get("format")).getOrElse("parquet"))
    else
      () => new ManifestRowLevelOperation(info.command(), path, schema0,
        Option(properties.get("format")).getOrElse("parquet"))
  }
  override def capabilities(): java.util.Set[TableCapability] = {
    val caps = java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.BATCH_READ, TableCapability.TRUNCATE,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)
    if (!strictSchema) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): org.apache.spark.sql.connector.read.ScanBuilder = {
    def opt(k: String): Option[String] =
      Option(options.get(k)).orElse(Option(properties.get(k)))
    val p = opt("path").getOrElse(throw new IllegalArgumentException(
      "graft-manifest read requires .option(\"path\", <directory URI>)"))
    // tag names resolve as range endpoints too ("changes since the
    // 'golden' tag") — the same refs VERSION AS OF reads
    def resolveRef(s: String): Int = ManifestFiles.resolveVersionStr(
      new Path(p).getFileSystem(
        SparkSession.active.sessionState.newHadoopConf()), new Path(p), s)
    val changes = opt("changesFrom").map(resolveRef).map { from =>
      require(opt("versionAsOf").isEmpty,
        "graft-manifest: changesFrom and versionAsOf are mutually exclusive")
      (from, opt("changesTo").map(resolveRef))
    }
    val changeFeed = opt("changeFeed").exists(_.toBoolean)
    val skipMaintenance = opt("skipMaintenance").exists(_.toBoolean)
    require(!skipMaintenance || changeFeed,
      "graft-manifest: skipMaintenance applies to change feed reads — " +
        "set .option(\"changeFeed\", true)")
    // a catalog-resolved table's schema cannot grow the CDF columns
    // (Table.schema() is fixed at load) — route to the path-based reader
    require(!changeFeed ||
      schema0.fieldNames.contains(ManifestChangeFeed.TypeCol),
      "graft-manifest: change feed reads are path-based — " +
        "spark.read.format(\"graft-manifest\").option(\"path\", dir)" +
        ".option(\"changeFeed\", true).option(\"changesFrom\", v)")
    val branch = opt("branch")
    require(branch.isEmpty || (changes.isEmpty && !changeFeed),
      "graft-manifest: branch reads are snapshot reads — incremental " +
        "tails and change feeds follow MAIN only")
    new ManifestScanBuilder(p, opt("versionAsOf").map(resolveRef), schema0,
      new SerializableHadoopConf(
        SparkSession.active.sessionState.newHadoopConf()),
      changes = changes,
      columnar = opt("columnar").map(_.toBoolean),
      ignoreDeletes = opt("ignoreDeletes").exists(_.toBoolean),
      changeFeed = changeFeed,
      skipMaintenance = skipMaintenance,
      branch = branch,
      filesSubset = opt("filesSubset")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet),
      maxFilesPerTrigger = opt("maxFilesPerTrigger").map { s =>
        val n = s.trim.toInt
        require(n > 0, s"maxFilesPerTrigger must be positive, got $n")
        n
      },
      maxBytesPerTrigger = opt("maxBytesPerTrigger").map { s =>
        val b = s.trim.toLong
        require(b > 0, s"maxBytesPerTrigger must be positive, got $b")
        b
      },
      maxRowsPerTrigger = opt("maxRowsPerTrigger").map { s =>
        val r = s.trim.toLong
        require(r > 0, s"maxRowsPerTrigger must be positive, got $r")
        r
      },
      minRowsPerTrigger = opt("minRowsPerTrigger").map { s =>
        val r = s.trim.toLong
        require(r > 0, s"minRowsPerTrigger must be positive, got $r")
        r
      },
      maxTriggerDelayMs = opt("maxTriggerDelayMs").map { s =>
        val d = s.trim.toLong
        require(d >= 0, s"maxTriggerDelayMs must be >= 0, got $d")
        d
      }.getOrElse(15000L),
      variantSkip = opt("variantSkip"))
  }
  /** Per-field type diff for the append-mismatch error (simpleString
    * hides nullability flags, which are part of dataType equality). */
  private def mismatchDetail(e: StructType, incoming: StructType): String =
    if (e.length != incoming.length) ""
    else e.fields.zip(incoming.fields).zipWithIndex.collect {
      case ((a, b), i) if !ManifestTable.writeCompatible(b.dataType, a.dataType) =>
        s"field $i '${a.name}': table ${a.dataType.json} vs " +
          s"write ${b.dataType.json}"
    }.mkString(" (", "; ", ")")

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // Same options→properties fallback as the scan builder: a table
    // resolved through GraftManifestCatalog carries its path in table
    // properties (SQL `INSERT INTO <cat>.<table>` passes no write
    // options), while `df.write.format(...)` passes it as an option.
    val raw = Option(info.options.get("path"))
      .orElse(Option(properties.get("path"))).getOrElse(
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
    // payload format: write option, then table property, default parquet
    // (validated eagerly — a typo'd format must fail at plan time, not in
    // a task); the extension on each committed file is what readers key on
    val format = Option(info.options.get("format"))
      .orElse(Option(properties.get("format"))).getOrElse("parquet")
    ManifestWriters.ext(format)
    // The CSV line payload carries primitives only; arrays / binary /
    // nested types (round 12) are PARQUET-ONLY. Refuse at plan time —
    // a task-side failure would leave staged garbage behind.
    if (format == "csv")
      info.schema().fields.find(f => !ManifestSkip.statsCapable(f.dataType))
        .foreach { f =>
          throw new UnsupportedOperationException(
            s"graft-manifest csv payload cannot store column " +
              s"'${f.name}' of type ${f.dataType.sql} — these are " +
              "parquet-only types; drop the format=csv option/property " +
              "(parquet is the default payload)")
        }
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var truncateRequested = false
      override def truncate(): WriteBuilder = { truncateRequested = true; this }
      override def build(): Write = new Write
          with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        // Bucketed layout (`option("bucketBy", col)` + `option("buckets", n)`):
        // demand a clustered-by-col distribution with EXACTLY n partitions
        // through DSv2's write-distribution seam — Spark inserts the
        // hash-repartition itself (partitionId = pmod(murmur3(col), n)), so
        // every task file holds one bucket and the commit records it for
        // the storage-partitioned-join read side. Zero extra shuffles: the
        // repartition IS the bucketing.
        private val bucketSpec: Option[(String, Int)] = {
          // option first (ad-hoc bucketed write), then the DDL-declared
          // layout a catalog-created table carries in its properties —
          // `INSERT INTO cat.t` clusters automatically
          def fromEither(k: String) = Option(info.options.get(k))
            .orElse(Option(properties.get(k)))
          val col = fromEither("bucketBy")
          val n = fromEither("buckets").map(_.toInt)
          (col, n) match {
            case (Some(c), Some(k)) =>
              require(k >= 1, s"buckets must be >= 1, got $k")
              val f = info.schema().fields.find(_.name == c).getOrElse(
                throw new IllegalArgumentException(
                  s"bucketBy column '$c' not in ${info.schema().fieldNames.mkString(",")}"))
              require(f.dataType == org.apache.spark.sql.types.LongType,
                s"bucketBy supports BIGINT columns (got ${f.dataType.sql}): " +
                  "the recorded layout must equal Spark's own " +
                  "HashPartitioning of the column")
              Some((c, k))
            case (None, None) => None
            case _ => throw new IllegalArgumentException(
              "bucketBy and buckets must be set together")
          }
        }
        // REPLACE TABLE staging (see GraftManifestCatalog.stageReplace):
        // the catalog passes the NEW DDL's #tableconf lines — the write
        // must honor THOSE, never the to-be-replaced table's layout
        // (presence of the key is the replace marker)
        private val replaceConf: Option[Array[String]] =
          Option(info.options.get("replaceConfLines"))
            .orElse(Option(properties.get("replaceConfLines")))
            .map(v => v.split("\n").filter(_.nonEmpty))

        // Declared days/months/identity partition layout (from the
        // `#tableconf,part` line on disk, so EVERY write route honors it
        // — catalog INSERTs and path-based appends alike). The write
        // demands a RANGE distribution + in-partition sort on the
        // column: clustered rows let the task-side partition-splitting
        // writer keep one open file at a time, and the file count stays
        // ~one per partition value instead of tasks × values.
        private val partLayout: Seq[(Int, String)] =
          replaceConf match {
            // a staged CREATE's declared layout references the NEW
            // schema (fresh positions == indices); staged REPLACE
            // refuses transforms, so its lines never carry `part`
            case Some(lines) => ManifestFiles.partConfs(lines)
              .filter(_._1 < info.schema().length)
            case None => try {
              val fs = path.getFileSystem(
                SparkSession.active.sessionState.newHadoopConf())
              ManifestFiles.partConfs(ManifestFiles.latestLines(fs, path))
                .flatMap { case (pos, kind) =>
                  ManifestFiles.fieldAtPhys(
                    ManifestFiles.schemaFor(fs, path, None), pos)
                    .map(idx => (idx, kind))
                }
            } catch { case _: Exception => Seq.empty }
          }

        // Declared `write.sort-order` (the `#tableconf,sortorder` line —
        // read from disk like the partition layout, so EVERY write route
        // honors it): schema indices in declared order. The write demands
        // a PER-TASK lexicographic sort on these columns, appended after
        // any partition clustering — no shuffle is added to the insert
        // path (Iceberg's write.distribution-mode=none + sort order);
        // each landed file is clustered on the keys, earns a verified
        // `#sorted` mark on the leading one, and compaction later turns
        // per-file order into disjoint table-wide ranges.
        // range distribution mode (declared with the sort order): an
        // explicit `option("distributionMode", "none")` overrides — the
        // compaction rewrite arranges its own exact-file-count layout
        private val distRange: Boolean =
          !Option(info.options.get("distributionMode")).contains("none") && {
            replaceConf match {
              case Some(lines) => ManifestFiles.distModeRange(lines)
              case None =>
                try ManifestFiles.distModeRange(ManifestFiles.latestLines(
                  path.getFileSystem(
                    SparkSession.active.sessionState.newHadoopConf()), path))
                catch { case _: Exception => false }
            }
          }

        // (schema index, desc, nullsLast) per declared sort key — the
        // full Iceberg sort-order surface, directions included
        private val sortLayout: Seq[(Int, Boolean, Boolean)] = replaceConf match {
          // a REPLACE's declared order references the NEW schema (fresh
          // positions == indices)
          case Some(lines) => ManifestFiles.sortKeysFromLines(lines)
            .filter(_.pos < info.schema().length)
            .map(k => (k.pos, k.desc, k.nullsLast))
          case None =>
            try {
              val fs = path.getFileSystem(
                SparkSession.active.sessionState.newHadoopConf())
              ManifestFiles.sortKeysFromLines(ManifestFiles.latestLines(fs, path))
                .flatMap(k => ManifestFiles.fieldAtPhys(
                  ManifestFiles.schemaFor(fs, path, None), k.pos)
                  .map(i => (i, k.desc, k.nullsLast)))
            } catch { case _: Exception => Seq.empty }
        }

        // `option("upsertKeys", "k1[,k2]")` — CDC UPSERT append via
        // EQUALITY DELETES (see ManifestEqDeletes): each task tees its
        // rows' distinct key tuples into a delete file, the commit
        // orders them BEFORE the batch's entries, and prior rows of
        // those keys vanish without this write reading ANY existing
        // data. Batch and streaming epochs share the seam.
        private val upsertKeys: Seq[Int] = {
          val opt = Option(info.options.get("upsertKeys"))
            .orElse(Option(properties.get("upsertKeys")))
          opt.map { cs =>
            require(bucketSpec.isEmpty,
              "upsertKeys cannot combine with a bucket-clustered write")
            val lines =
              try ManifestFiles.latestLines(path.getFileSystem(
                SparkSession.active.sessionState.newHadoopConf()), path)
              catch { case _: Exception => Array.empty[String] }
            require(ManifestFiles.isMergeOnRead(lines),
              "upsertKeys requires a merge-on-read table " +
                "(TBLPROPERTIES('delete.mode'='merge-on-read')) — " +
                "equality deletes are a MOR concept")
            val keys = cs.split(",").map(_.trim).filter(_.nonEmpty).toSeq
              .map { c =>
                val i = info.schema().fieldNames.indexOf(c)
                require(i >= 0, s"upsertKeys column '$c' not in " +
                  info.schema().fieldNames.mkString(","))
                val dt = info.schema().fields(i).dataType
                require(ManifestEqDeletes.keyTypeOk(dt),
                  s"upsertKeys column '$c' is ${dt.sql} — keys must be " +
                    "exact-equality primitives (integrals, string, " +
                    "boolean, date, timestamp)")
                i
              }
            require(keys.nonEmpty, "upsertKeys must name at least one column")
            require(keys.distinct.length == keys.length,
              "duplicate column in upsertKeys")
            keys
          }.getOrElse(Seq.empty)
        }

        // `option("sortedBy", col)` — sorted buckets: demand an
        // in-partition sort through the same write seam, so every bucket
        // file lands sorted and a bucketed+sorted join needs neither
        // exchange NOR sort. Only meaningful with bucketBy.
        private val sortedBy: Option[String] = {
          val c = Option(info.options.get("sortedBy"))
            .orElse(Option(properties.get("sortedBy")))
          c.foreach { col =>
            require(bucketSpec.isDefined,
              "sortedBy requires bucketBy/buckets (sorted buckets)")
            require(info.schema().fieldNames.contains(col),
              s"sortedBy column '$col' not in ${info.schema().fieldNames.mkString(",")}")
          }
          c
        }
        private def partSortOrder(idx: Int) =
          org.apache.spark.sql.connector.expressions.Expressions.sort(
            org.apache.spark.sql.connector.expressions.Expressions.column(
              info.schema().fields(idx).name),
            org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)

        private def keySortOrder(k: (Int, Boolean, Boolean)) = {
          import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection}
          Expressions.sort(
            Expressions.column(info.schema().fields(k._1).name),
            if (k._2) SortDirection.DESCENDING else SortDirection.ASCENDING,
            if (k._3) NullOrdering.NULLS_LAST else NullOrdering.NULLS_FIRST)
        }

        override def requiredDistribution():
            org.apache.spark.sql.connector.distributions.Distribution =
          bucketSpec match {
            case Some((c, _)) =>
              org.apache.spark.sql.connector.distributions.Distributions
                .clustered(Array(
                  org.apache.spark.sql.connector.expressions.Expressions.identity(c)))
            case None =>
              if (partLayout.nonEmpty)
                // composite layouts range-distribute lexicographically on
                // ALL partition columns in declared order — clustered
                // rows keep the split writer near one open file
                org.apache.spark.sql.connector.distributions.Distributions
                  .ordered(partLayout.map(p => partSortOrder(p._1)).toArray)
              else if (distRange && sortLayout.nonEmpty)
                // declared write.distribution-mode=range: inserts pay one
                // range shuffle on the sort columns, so files land
                // range-DISJOINT without waiting for a compaction
                org.apache.spark.sql.connector.distributions.Distributions
                  .ordered(sortLayout.map(keySortOrder).toArray)
              else
                org.apache.spark.sql.connector.distributions.Distributions
                  .unspecified()
          }
        override def requiredNumPartitions(): Int =
          bucketSpec.map(_._2).getOrElse(0)
        override def requiredOrdering():
            Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          sortedBy.map(c => Array(
            org.apache.spark.sql.connector.expressions.Expressions.sort(
              org.apache.spark.sql.connector.expressions.Expressions.column(c),
              org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)))
            .getOrElse {
              // partition clustering first (the split writer's file-count
              // guarantee rides it), then the declared sort order — a
              // sort column that IS a partition column needs no second
              // sort key (each file is value-pure on it already)
              val partIdx = partLayout.map(_._1)
              (partIdx.map(partSortOrder) ++
                sortLayout.filterNot(k => partIdx.contains(k._1))
                  .map(keySortOrder)).toArray
            }

        override def toBatch: BatchWrite = {
          if (truncateRequested) require(upsertKeys.isEmpty,
            "upsertKeys with mode(\"overwrite\") is meaningless — the " +
              "truncate already discards every prior row")
          // The authoritative previous schema is the published `_SCHEMA`
          // on disk (schema0 is the DataFrame's own schema on path-based
          // writes — supportsExternalMetadata). Appends must align with
          // it positionally (ACCEPT_ANY_SCHEMA paths hand us the INPUT's
          // column names verbatim — a SQL `INSERT ... VALUES` arrives as
          // col1/col2/... — so the commit republishes the names already
          // on disk); truncate may legitimately rewrite the schema.
          val incoming0 = info.schema()
          val hconf = new SerializableHadoopConf(
            SparkSession.active.sessionState.newHadoopConf())
          val fs = path.getFileSystem(hconf.value)
          // ROW LINEAGE rewrite carry: a write whose TRAILING columns
          // are the reserved `_row_id` [+ `_last_updated_version`]
          // (compact / Z-order re-selecting the metadata columns)
          // materializes them per-file instead of storing them as data —
          // the names are reserved, so this can never misread a user
          // column
          val carriesLuv = incoming0.fields.lastOption.exists(f =>
            f.name == "_last_updated_version" &&
              f.dataType == org.apache.spark.sql.types.IntegerType)
          val ridSlot = incoming0.length - 1 - (if (carriesLuv) 1 else 0)
          val carriesRid = ridSlot >= 0 && {
            val f = incoming0.fields(ridSlot)
            f.name == "_row_id" && f.dataType == LongType
          }
          require(!carriesLuv || carriesRid,
            "_last_updated_version carries only alongside _row_id " +
              "(both names are reserved for row lineage)")
          // IO failures PROPAGATE (round-15 advice): a swallowed read
          // here would reject a legitimate lineage rewrite on a blip
          if (carriesRid)
            require(ManifestFiles.isLineage(
                ManifestFiles.latestLines(fs, path)),
              "writing a _row_id column requires " +
                "TBLPROPERTIES('row.lineage'='true') on the target table " +
                "(the name is reserved for row lineage)")
          val incoming =
            if (carriesRid)
              StructType(incoming0.fields.dropRight(if (carriesLuv) 2 else 1))
            else incoming0
          // BRANCH writes (write-audit-publish): the commit lands on the
          // branch's own chain; the branch must exist (create_branch)
          val branch = Option(info.options.get("branch"))
            .orElse(Option(properties.get("branch")))
          // Branch chains share main's version numbering (the fork is a
          // twin of main's v<base>), so version-scoped metadata —
          // `#born` birth markers, `#eqdels` sequencing — means the same
          // thing on both chains: upserts stage on branches and live
          // equality deletes survive the fork, verbatim through
          // fast_forward's replay.
          branch.foreach { b =>
            require(ManifestFiles.latestComplete(fs, path, Some(b)) > 0,
              s"no branch '$b' at $path — CALL create_branch first " +
                s"(branches: ${ManifestFiles.branches(fs, path).sorted.mkString(", ")})")
          }
          val existing =
            if (truncateRequested) None
            else if (branch.isDefined)
              Some(ManifestFiles.schemaFor(fs, path, None, branch))
            else if (fs.exists(new Path(path, "_SCHEMA")))
              Some(ManifestFiles.schemaFor(fs, path, None))
            else None
          existing.foreach { e =>
            val aligned = e.length == incoming.length &&
              e.fields.zip(incoming.fields).forall { case (t, w) =>
                ManifestTable.writeCompatible(w.dataType, t.dataType) }
            if (!aligned) throw new IllegalArgumentException(
              s"graft-manifest append schema mismatch: table has " +
                s"${e.simpleString}, write provides ${incoming.simpleString}" +
                mismatchDetail(e, incoming))
          }
          // first write to a fresh table: publish NULLABLE at every level
          // (Spark's own file sinks do the same) — the first DF's
          // incidental non-nullability must not reject later appends
          val finalSchema = existing.getOrElse(ManifestTable.nullableSchema(incoming))
          new ManifestBatchWrite(
            path.toString, info.queryId(),
            Option(info.options.get("failPartition")).map(_.toInt).getOrElse(-1),
            finalSchema, truncateRequested, hconf,
            bucketSpec = bucketSpec.map { case (c, n) =>
              // record the PHYSICAL position so renames/drops keep the
              // layout valid (name resolves in the write's own schema)
              (ManifestFiles.physPos(finalSchema, incoming.fieldIndex(c)), n)
            },
            // row INDEX for the writer's sort check; the commit converts
            // it to the physical position when marking #sorted. A declared
            // write.sort-order marks (and verifies) its LEADING column —
            // lexicographic order implies order on the first key.
            sortPos = sortedBy.map(c => (incoming.fieldIndex(c), false, false))
              .orElse(sortLayout.headOption),
            // a DDL-declared layout (from table properties) must survive
            // INSERT OVERWRITE — re-emit its #tableconf line on truncate;
            // a staged REPLACE instead swaps in the NEW DDL's lines
            confLines = replaceConf.getOrElse(
              if (Option(properties.get("bucketBy")).isDefined)
                bucketSpec.map { case (c, n) =>
                  ManifestFiles.tableConfLine(
                    ManifestFiles.physPos(finalSchema, incoming.fieldIndex(c)),
                    n, sortedBy.map(c2 => ManifestFiles.physPos(finalSchema,
                      incoming.fieldIndex(c2))))
                }.toArray
              else Array.empty),
            format = format,
            branch = branch,
            upsertKeys = upsertKeys,
            replaceConf = replaceConf.isDefined,
            requireFresh = Option(properties.get("requireFreshTable"))
              .contains("true"),
            ridIdx = if (carriesRid) incoming.length else -1,
            luvIdx = if (carriesLuv) incoming.length + 1 else -1,
            // compaction declares the state its scan saw; the claim
            // validates nothing conflicting landed (rewrites derive
            // from the scan — see the commit closure)
            scannedDeleteState = () =>
              Option(info.options.get("scannedDeleteState")).map(v =>
                if (v.isEmpty) Set.empty[String] else v.split("\n").toSet),
            scannedEntries = () =>
              Option(info.options.get("scannedEntries")).map(v =>
                if (v.isEmpty) Set.empty[String] else v.split("\n").toSet),
            maintenance = Option(info.options.get("maintenanceRewrite"))
              .contains("true"))
        }
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          if (truncateRequested) throw new UnsupportedOperationException(
            "graft-manifest streaming sink supports append output mode " +
              "only (Complete-mode truncation would also discard the " +
              "exactly-once #txn markers)")
          val incoming = info.schema()
          val hconf = new SerializableHadoopConf(
            SparkSession.active.sessionState.newHadoopConf())
          val fs = path.getFileSystem(hconf.value)
          val branch = Option(info.options.get("branch"))
            .orElse(Option(properties.get("branch")))
          branch.foreach { b =>
            // shared numbering makes upserts/eqdels branch-safe — see
            // the batch path's note above
            require(ManifestFiles.latestComplete(fs, path, Some(b)) > 0,
              s"no branch '$b' at $path — CALL create_branch first " +
                s"(branches: ${ManifestFiles.branches(fs, path).sorted.mkString(", ")})")
          }
          val existing =
            if (branch.isDefined)
              Some(ManifestFiles.schemaFor(fs, path, None, branch))
            else if (fs.exists(new Path(path, "_SCHEMA")))
              Some(ManifestFiles.schemaFor(fs, path, None))
            else None
          existing.foreach { e =>
            val aligned = e.length == incoming.length &&
              e.fields.zip(incoming.fields).forall { case (t, w) =>
                ManifestTable.writeCompatible(w.dataType, t.dataType) }
            if (!aligned) throw new IllegalArgumentException(
              s"graft-manifest append schema mismatch: table has " +
                s"${e.simpleString}, write provides ${incoming.simpleString}" +
                mismatchDetail(e, incoming))
          }
          new ManifestStreamingWrite(path.toString, info.queryId(),
            existing.getOrElse(ManifestTable.nullableSchema(incoming)), hconf,
            format, branch, upsertKeys = upsertKeys)
        }
      }
    }
  }
}

/** One row-level operation instance spans its scan AND its write (the
  * `GroupBasedRowLevelOperation` contract): the scan records which
  * manifest entries it finally planned (post group filter) on the
  * driver, and the replacing write's commit drops exactly those entries
  * from the previous snapshot. Fresh Hadoop conf is resolved lazily so
  * the operation builder stays cheap at analysis time. */
private[sources] class ManifestRowLevelOperation(
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
    path: String, tableSchema: StructType,
    // payload format of rewrite files — honors the table's pin the same
    // way plain appends and the MOR delta path do
    tableFormat: String = "parquet")
    extends org.apache.spark.sql.connector.write.RowLevelOperation {

  @volatile private var scanned: Array[String] = Array.empty
  // the delete-state lines (#dels/#eqdels) of the snapshot the scan
  // planned — the replacing commit validates none appeared since (a
  // concurrent MOR delete / CDC upsert would otherwise RESURRECT its
  // deleted rows: this rewrite's files were computed without the new
  // state, and post-rewrite files are born past an eqdel's version)
  @volatile private var scannedDeleteState: Set[String] = Set.empty

  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd
  override def description(): String = s"graft-manifest COPY_ON_WRITE $cmd $path"

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): org.apache.spark.sql.connector.read.ScanBuilder =
    // statsSkip OFF: the commit drops exactly the planned files, and the
    // pushed predicate here is the SURVIVOR condition — stats-skipping a
    // fully-deleted file would keep it alive (see ManifestScanBuilder).
    new ManifestScanBuilder(path, None, tableSchema,
      new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()),
      onPlanned = names => scanned = names, statsSkip = false,
      onDeleteState = state => scannedDeleteState = state,
      // pre-lineage rows surface the 0 sentinel (not NULL) to the
      // rewrite, so a COW DELETE/UPDATE/MERGE cannot stamp untouched
      // pre-lineage survivors with its own version (they must keep
      // reading NULL — the same contract the compaction rewrite keeps).
      // DOCUMENTED CAVEAT: the sentinel scan also serves the
      // statement's own WHERE evaluation, so `_last_updated_version`
      // predicates INSIDE a COW row-level statement see 0 where a
      // SELECT sees NULL for pre-lineage rows (both encode "never
      // updated since lineage enabled" — write such conditions as
      // `coalesce(_last_updated_version, 0) = 0`); pinned by
      // ManifestRowLineageSpec. The alternative — NULL to predicates,
      // sentinel to the writer — is unreachable: both read the same
      // scan output attribute, and Spark's PRESERVE_ON_UPDATE nulling
      // erases the distinction before the writer could recover it.
      luvSentinel = lineage)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = {
          val inner = new ManifestBatchWrite(
            path, info.queryId(), -1,
            // Replacement rows carry the table's columns; keep its names.
            if (tableSchema.nonEmpty) tableSchema else info.schema(),
            truncate = false,
            new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()),
            dropFromPrevious = () => scanned.toSet,
            scannedDeleteState = () => Some(scannedDeleteState),
            format = Option(info.options.get("format")).getOrElse(tableFormat),
            // ROW LINEAGE through copy-on-write: the operation asked for
            // `_row_id` (see requiredMetadataAttributes), so Spark's
            // DataAndMetadataWritingSparkTask hands each replacement row's
            // [_file, _row_id] metadata projection to the writer's 2-arg
            // write — carried from the target for surviving/updated rows,
            // NULL for MERGE-inserted ones — and the rewrite files
            // materialize it as their `_rid` column
            ridFromMeta = lineage)
          // When the statement's own WHERE references a metadata column
          // (e.g. `DELETE ... WHERE _last_updated_version IS NULL`),
          // Spark folds ALL requested metadata columns into the DATA
          // schema instead of the split metadata projection — the rows
          // arrive as [table cols…, _file, _pos?, _row_id, _luv]. The
          // adapter projects the row back to the table schema and
          // re-routes _row_id/_last_updated_version through the 2-arg
          // meta channel, so lineage semantics are identical to the
          // split-task path (round-16 review pass 4: this shape
          // previously crashed the parquet writer on arity).
          val in = info.schema()
          if (tableSchema.isEmpty || in.fieldNames.sameElements(
              tableSchema.fieldNames)) inner
          else {
            val dataIdx = tableSchema.fieldNames
              .map(n => in.fieldNames.indexOf(n))
            require(dataIdx.forall(_ >= 0),
              s"graft-manifest row-level write schema ${in.fieldNames
                .mkString(",")} is missing table columns " +
                tableSchema.fieldNames.mkString(","))
            val extras = in.fieldNames.zipWithIndex
              .filterNot { case (_, i) => dataIdx.contains(i) }
            val meta = Set("_file", "_pos", "_row_id",
              "_last_updated_version")
            require(extras.forall(e => meta.contains(e._1)),
              s"graft-manifest row-level write schema carries unexpected " +
                s"columns: ${extras.map(_._1).mkString(",")}")
            val ridAt = in.fieldNames.indexOf("_row_id")
            val luvAt = in.fieldNames.indexOf("_last_updated_version")
            new RowLevelMetaAdapter(inner, tableSchema, dataIdx, ridAt,
              luvAt)
          }
        }
      }
    }

  private lazy val lineage: Boolean = ManifestFiles.isLineageAt(
    new Path(path), SparkSession.active.sessionState.newHadoopConf())

  override def requiredMetadataAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val base = Array(
      org.apache.spark.sql.connector.expressions.Expressions.column("_file"))
    if (lineage)
      base ++ Array(
        org.apache.spark.sql.connector.expressions.Expressions.column("_row_id"),
        org.apache.spark.sql.connector.expressions.Expressions
          .column("_last_updated_version"))
    else base
  }
}

/** Adapts a COW rewrite whose data rows carry folded-in metadata
  * columns (the WHERE referenced one) back to the writer's split
  * contract: project the table columns, hand `_row_id` /
  * `_last_updated_version` through the 2-arg meta channel. `_file` /
  * `_pos` are positional bookkeeping of the SOURCE file — the rewrite
  * assigns fresh ones, so they drop. */
private[sources] class RowLevelMetaAdapter(
    inner: BatchWrite, tableSchema: StructType, dataIdx: Array[Int],
    ridAt: Int, luvAt: Int) extends BatchWrite {
  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo):
      org.apache.spark.sql.connector.write.DataWriterFactory = {
    val f = inner.createBatchWriterFactory(info)
    val dts = tableSchema.fields.map(_.dataType)
    val di = dataIdx
    val (ra, la) = (ridAt, luvAt)
    new org.apache.spark.sql.connector.write.DataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long):
          org.apache.spark.sql.connector.write.DataWriter[InternalRow] = {
        val d = f.createWriter(partitionId, taskId)
        new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
          private val meta = new org.apache.spark.sql.catalyst
            .expressions.GenericInternalRow(3)
          private val data = new org.apache.spark.sql.catalyst
            .expressions.GenericInternalRow(di.length)
          override def write(r: InternalRow): Unit = {
            var i = 0
            while (i < di.length) {
              data.update(i,
                if (r.isNullAt(di(i))) null else r.get(di(i), dts(i)))
              i += 1
            }
            meta.update(0, null)
            meta.update(1,
              if (ra < 0 || r.isNullAt(ra)) null
              else java.lang.Long.valueOf(r.getLong(ra)))
            meta.update(2,
              if (la < 0 || r.isNullAt(la)) null
              else java.lang.Integer.valueOf(r.getInt(la)))
            d.write(meta, data)
          }
          override def commit():
              org.apache.spark.sql.connector.write.WriterCommitMessage =
            d.commit()
          override def abort(): Unit = d.abort()
          override def close(): Unit = d.close()
        }
      }
    }
  }
  override def commit(messages: Array[
      org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    inner.commit(messages)
  override def abort(messages: Array[
      org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    inner.abort(messages)
  override def useCommitCoordinator(): Boolean =
    inner.useCommitCoordinator()
}

private[sources] case class FileCommitted(name: String, rows: Long,
    bytes: Long = -1L, stats: Seq[(Int, ManifestFiles.ColStats)] = Nil,
    bucket: Int = -1, sortedOk: Boolean = false,
    // struct LEAF stats, keyed by dotted position paths (round 12)
    nestedStats: Seq[(String, ManifestFiles.ColStats)] = Nil,
    // per-file HLL registers for declared stats.ndv.columns, keyed by
    // PHYSICAL position (round 14 — ManifestNdv)
    ndv: Seq[(Int, Array[Byte])] = Nil,
    // per-file histogram samples for declared stats.histogram.columns
    // (round 15 — ManifestHist): (physical pos, (sorted sample, nonNull))
    hist: Seq[(Int, (Array[Double], Long))] = Nil,
    // row lineage: this file carries a materialized `_rid` column
    // (rewrite output) — the commit marks it `#ridcol`
    ridCol: Boolean = false,
    // and a materialized `_luv` column — the commit marks it `#luvcol`
    luvCol: Boolean = false)
  extends WriterCommitMessage

/** A partition-split task's commit: one staged file per partition value
  * the task saw (days/months/identity layouts). */
private[sources] case class FilesCommitted(files: Seq[FileCommitted])
  extends WriterCommitMessage

private[sources] class ManifestBatchWrite(path: String, queryId: String,
    failPartition: Int, schema: StructType, truncate: Boolean,
    conf: SerializableHadoopConf,
    // Row-level COPY_ON_WRITE: entries the operation's scan planned are
    // dropped from the previous snapshot and replaced by this commit's
    // fresh files (evaluated at commit time, after the scan executed).
    // Old versions keep referencing the dropped files — time travel
    // still reads the pre-image.
    dropFromPrevious: () => Set[String] = () => Set.empty,
    // Some(state) on a replacing commit: the #dels/#eqdels lines of the
    // snapshot the operation SCANNED — the claim closure validates the
    // rewrite against concurrent commits (see below)
    scannedDeleteState: () => Option[Set[String]] = () => None,
    // Some(names) on a TRUNCATING rewrite that derives from a scan
    // (full compaction): the entries the scan saw. The closure keeps
    // entries a concurrent commit ADDED since (blind appends commute
    // with a compaction) and aborts if a scanned entry vanished (a
    // concurrent rewrite — landing both outputs would double rows)
    scannedEntries: () => Option[Set[String]] = () => None,
    // (colPos, n) when this write was bucket-clustered — each commit
    // message's partitionId IS the file's bucket id.
    bucketSpec: Option[(Int, Int)] = None,
    // column position the write demanded an in-partition sort on; the
    // task writer VERIFIES monotonicity as rows stream and only then
    // marks the file `#sorted` (trust but verify — a planner change that
    // dropped the sort would degrade ordering, never corrupt it)
    sortPos: Option[(Int, Boolean, Boolean)] = None,
    // DDL `#tableconf` lines to guarantee in the committed snapshot
    // (appends inherit them from the predecessor; truncate must re-emit)
    confLines: Array[String] = Array.empty,
    // payload format of THIS commit's files ("parquet" default / "csv");
    // a per-file property, so mixed-format history reads fine
    format: String = "parquet",
    // write-audit-publish: commit onto this branch's chain, not main's
    branch: Option[String] = None,
    // CDC upsert (equality deletes): schema indices of the key columns;
    // the commit lands `#eqdels` lines BEFORE this batch's entries
    upsertKeys: Seq[Int] = Seq.empty,
    // staged REPLACE TABLE: the truncate drops the OLD #tableconf lines
    // (confLines carries the new DDL's) instead of preserving them
    replaceConf: Boolean = false,
    // staged CREATE (atomic CTAS): this commit must BE version 1 — a
    // concurrent CREATE that claimed first aborts this one loudly
    // instead of silently merging two tables
    requireFresh: Boolean = false,
    // row lineage: index in the incoming row carrying the `_row_id` to
    // materialize per file (-1 = plain write)
    ridIdx: Int = -1,
    // row lineage via the COW metadata channel (write(meta, row))
    ridFromMeta: Boolean = false,
    // `_last_updated_version`: index of the carried value (-1 = none)
    luvIdx: Int = -1,
    // row-preserving maintenance rewrite (full compaction): the commit
    // lands a `#maint` marker — see ManifestFiles.maintLine
    maintenance: Boolean = false) extends BatchWrite {

  // Per-job staging namespace: concurrent writes (or an overlapping retry
  // of another job) can never see or delete each other's in-flight files.
  private val stagingName = s".staging-$queryId"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    // Declared days/months/identity layout, re-read from disk HERE so
    // every batch route splits files per partition value — plain
    // appends, catalog INSERTs, COW rewrites, compact, AND streaming
    // epochs (ManifestStreamingWrite) all preserve the layout.
    // a staged REPLACE enforces the NEW DDL's declared intent (checks,
    // blooms) — the to-be-replaced table's lines are history
    val lines =
      if (replaceConf) confLines
      else
        try ManifestFiles.latestLines(
          new Path(path).getFileSystem(conf.value), new Path(path))
        catch { case _: Exception => Array.empty[String] }
    val partSpec: Seq[(Int, String)] =
      ManifestFiles.partConfs(lines).flatMap { case (pos, kind) =>
        ManifestFiles.fieldAtPhys(schema, pos).map(idx => (idx, kind)) }
    // declared bloom-filter columns ride the task conf (physical c<pos>
    // names — the parquet writer's column identifiers)
    ManifestParquet.setBloomCols(conf.value,
      ManifestFiles.bloomFromLines(lines))
    new ManifestWriterFactory(path, stagingName, failPartition, schema, conf,
      recordBucket = bucketSpec.isDefined, sortPos = sortPos, format = format,
      partSpec = partSpec,
      checks = ManifestChecks.bind(SparkSession.active, schema,
        ManifestFiles.checksFromLines(lines)),
      upsertKeys = upsertKeys.toArray,
      // histogram columns track NDV sketches too: catalyst's
      // FilterEstimation refuses a histogram without count stats
      // (hasCountStats), so a histogram-only declaration would never fire
      ndvPos = (ManifestFiles.ndvFromLines(lines) ++
          ManifestFiles.histDeclFromLines(lines)).distinct
        .flatMap(ManifestFiles.fieldAtPhys(schema, _)).toArray,
      histPos = ManifestFiles.histDeclFromLines(lines)
        .flatMap(ManifestFiles.fieldAtPhys(schema, _)).toArray,
      ridIdx = ridIdx, ridFromMeta = ridFromMeta, luvIdx = luvIdx,
      shred = ManifestShred.writerSpecs(lines, schema))
  }

  // Driver-side, exactly once, only after EVERY task committed: publish.
  // Each commit is a VERSION: append merges the predecessor snapshot's
  // entries, truncate (mode("overwrite")) starts from empty. Versioning
  // and concurrency live in ManifestFiles.publishSnapshot — optimistic
  // rebase: the claim loop re-reads the predecessor on every retry, so
  // concurrent committers merge rather than overwrite each other (no
  // lost updates; spec: ManifestConcurrencySpec). Readers of "latest"
  // see either the old or the new complete snapshot, never a mix;
  // version readers see immutable files.
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    val staging = new Path(dir, stagingName)
    def landOne(m: FileCommitted): Seq[String] = {
      val fin = m.name.stripSuffix(".tmp")
      val ok = fs.rename(new Path(staging, m.name), new Path(dir, fin))
      require(ok, s"staged file ${m.name} vanished before commit")
      Seq(s"$fin,${m.rows}",
        ManifestFiles.statsLine(fin, m.bytes, m.stats, m.nestedStats)) ++
        (if (m.ndv.nonEmpty) Seq(ManifestNdv.line(fin, m.ndv)) else Nil) ++
        (if (m.hist.nonEmpty) Seq(ManifestHist.line(fin, m.hist)) else Nil) ++
        (if (m.ridCol) Seq(ManifestFiles.ridColLine(fin)) else Nil) ++
        (if (m.luvCol) Seq(ManifestFiles.luvColLine(fin)) else Nil) ++
        bucketSpec.map { case (pos, n) =>
          ManifestFiles.bucketLine(fin, pos, n, m.bucket) } ++
        (sortPos.filter(_ => m.sortedOk).map { case (p, desc, nullsLast) =>
          ManifestFiles.sortedLine(fin, ManifestFiles.physPos(schema, p),
            desc, nullsLast) })
    }
    // unwrap upsert tees: their staged equality-delete files land now;
    // the `#eqdels` lines are built inside the claim closure, where the
    // attempted version is known (explicit sequencing — see
    // ManifestEqDeletes)
    val eqdelFins = messages.collect {
      case ManifestEqDeletes.UpsertCommitted(_, Some(tmp), _) =>
        val fin = tmp.stripSuffix(".tmp")
        require(fs.rename(new Path(staging, tmp), new Path(dir, fin)),
          s"staged equality-delete file $tmp vanished before commit")
        fin
    }
    val fresh = messages.flatMap {
      case ManifestEqDeletes.UpsertCommitted(inner, _, _) => inner match {
        case f: FileCommitted => landOne(f)
        case FilesCommitted(files) => files.flatMap(landOne)
        case other => throw new IllegalStateException(other.toString)
      }
      case f: FileCommitted => landOne(f)
      // partition-split tasks: one message, many files
      case FilesCommitted(files) => files.flatMap(landOne)
    }
    val freshNames = fresh.filterNot(_.startsWith("#"))
      .map(l => l.substring(0, l.lastIndexOf(',')))
    val eqPositions = upsertKeys.map(k =>
      ManifestFiles.physPos(schema, k)).mkString(";")
    val drop = dropFromPrevious()
    val scanState = scannedDeleteState()
    val scanEntries = scannedEntries()
    // The base snapshot is supplied by publishSnapshot's claim loop (the
    // immediate predecessor version, re-read on every retry), so a
    // concurrent committer's files are never lost from the merge.
    ManifestFiles.publishSnapshotV(fs, conf.value, dir, (previous, version) => {
      require(!requireFresh || (previous.isEmpty && version == 1),
        s"graft-manifest at $path: a concurrent committer published a " +
          "version while this CREATE TABLE AS SELECT was staging — " +
          "aborting instead of appending to someone else's table")
      // WRITE-CONFLICT VALIDATION for replacing commits (the COW twin of
      // the MOR guard in ManifestDelta): (a) every file this rewrite
      // replaces must still be listed — a concurrent rewrite/compaction
      // of the same file would otherwise DOUBLE its surviving rows (both
      // rewrites land) and resurrect the winner's deletions; (b) no
      // delete state (#dels vectors, #eqdels upsert sets) may have
      // landed since the scan — the rewrite was computed without it, and
      // rewrite files are born past an eqdel's version, so committing
      // anyway would resurrect concurrently-deleted rows. Blind APPENDS
      // racing a row-level op stay fine (their files are neither dropped
      // nor delete state) — snapshot-isolation semantics, matching
      // Delta's WriteSerializable and Iceberg's overwrite validation.
      if (drop.nonEmpty) {
        val live = ManifestFiles.entriesFromLines(previous).map(_._1).toSet
        val gone = drop -- live
        if (gone.nonEmpty) throw new IllegalStateException(
          s"graft-manifest at $path: this row-level operation rewrites " +
            s"${gone.size} file(s) a concurrent commit already rewrote " +
            s"or removed (e.g. ${gone.head}); retry the operation " +
            "against the current snapshot")
      }
      // delete-state validation runs for EVERY commit that declared a
      // scanned state — row-level COW ops (drop-based) AND compaction's
      // truncating rewrite, whose content equally derives from the scan
      scanState.foreach { known =>
        val newState = previous.filter(l => l.startsWith("#dels,") ||
          l.startsWith("#eqdels,")).filterNot(known)
        if (newState.nonEmpty) throw new IllegalStateException(
          s"graft-manifest at $path: a concurrent commit landed new " +
            s"row-level delete state (e.g. ${newState.head}) after " +
            "this operation's scan — committing the rewrite would " +
            "resurrect those deleted rows; retry the operation " +
            "against the current snapshot")
      }
      // DDL intent (#tableconf) persists until DROP TABLE: truncation
      // replaces the DATA, not the declared layout — and a branch's
      // fork-point marker (#branchbase) must survive both shapes, or
      // fast_forward loses its divergence check. The row-id high-water
      // mark (#tableconf,rowidnext) survives even a CREATE OR REPLACE
      // that drops every other conf line: ids already handed to readers
      // must never be re-minted for different rows, and a replacement
      // that re-declares row.lineage would otherwise restart from 0.
      val base =
        if (truncate) {
          val conf0 = previous.filter(l =>
            ((!replaceConf || l.startsWith("#tableconf,rowidnext,")) &&
              l.startsWith("#tableconf,") &&
              // a truncating rewrite replaces EVERY byte at the current
              // type — the narrow-history widening markers clear with it
              !l.startsWith("#tableconf,widened,")) ||
              l.startsWith("#branchbase,"))
          scanEntries match {
            case None => conf0 // plain INSERT OVERWRITE: last writer wins
            case Some(scanned) =>
              // compaction: its output REPLACES exactly the scanned
              // entries. A scanned entry already gone = a concurrent
              // rewrite raced us (landing both outputs doubles rows);
              // entries ADDED since the scan are blind appends — they
              // commute, keep them (and their riders) verbatim.
              val present = ManifestFiles.entriesFromLines(previous)
                .map(_._1).toSet
              val gone = scanned -- present
              if (gone.nonEmpty) throw new IllegalStateException(
                s"graft-manifest at $path: a concurrent commit rewrote " +
                  s"or removed ${gone.size} file(s) this compaction " +
                  s"derives from (e.g. ${gone.head}); retry against the " +
                  "current snapshot")
              conf0 ++ previous.filter(l =>
                ManifestSink.entryName(l).exists(n => !scanned(n)))
          }
        }
        else previous.filterNot(line => ManifestSink.entryName(line).exists(drop))
      val conf0 = confLines.filterNot(base.contains)
      val eqdels = eqdelFins.map(f => s"#eqdels,$f,$eqPositions,$version")
      // merge-on-read tables mark every entry's BIRTH version so later
      // equality deletes can scope around it; elsewhere the marker is
      // dead weight and stays absent
      val born: Array[String] =
        if (ManifestFiles.isMergeOnRead(previous) || eqdelFins.nonEmpty)
          freshNames.map(n => ManifestFiles.bornLine(n, version))
        else Array.empty
      val maint: Array[String] =
        if (maintenance) Array(ManifestFiles.maintLine(version))
        else Array.empty
      conf0 ++ base ++ eqdels ++ fresh ++ born ++ maint
    }, schema, branch)
    fs.delete(staging, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    dir.getFileSystem(conf.value)
      .delete(new Path(dir, stagingName), true)
  }
}

/** Task-side staged data-file writer, shared by the batch and streaming
  * factories — only the staged file NAME differs (streaming prefixes
  * the epoch so retried epochs never collide with committed files).
  * Payload format is per file: `parquet` (the default — real columnar
  * storage through Spark's ParquetWriteSupport, see ManifestParquet) or
  * the legacy `csv` lines. Stats/sort tracking is format-independent:
  * min/max/null counts stream through the SAME canonical comparator the
  * skip evaluator uses, whatever lands on disk. */
private[sources] object ManifestWriters {
  /** Staged-file extension for a format ("" = CSV lines; the final name
    * keeps it, which is how readers pick the per-file decoder). */
  def ext(format: String): String = format match {
    case "parquet" => ".parquet"
    case "csv" => ""
    case other => throw new IllegalArgumentException(
      s"graft-manifest format must be 'parquet' or 'csv', got '$other'")
  }

  def create(path: String, stagingName: String, name: String,
      schema: StructType, conf: SerializableHadoopConf,
      injectFailure: Boolean, bucket: Int = -1,
      sortPos: Option[(Int, Boolean, Boolean)] = None,
      // schema indices of declared stats.ndv.columns — each tracks a
      // per-file HLL as rows stream (ManifestNdv)
      ndvPos: Array[Int] = Array.empty,
      // schema indices of declared stats.histogram.columns — each
      // tracks a per-file deterministic sample (ManifestHist)
      histPos: Array[Int] = Array.empty,
      // row lineage REWRITE: index in the incoming row holding the
      // carried `_row_id` (after the data columns); >= 0 materializes it
      // into the file's `_rid` column and marks the commit `#ridcol`
      ridIdx: Int = -1,
      // row lineage through COPY-ON-WRITE row-level plans: Spark's
      // DataAndMetadataWritingSparkTask delivers each row's projected
      // METADATA row through the two-argument `write(metadata, row)` —
      // our requiredMetadataAttributes order puts `_row_id` at slot 1
      // (after `_file`) and `_last_updated_version` at slot 2; true
      // materializes both exactly like ridIdx/luvIdx
      ridFromMeta: Boolean = false,
      // `_last_updated_version` carry: index in the incoming row (after
      // the data columns and the carried `_row_id`); >= 0 materializes
      // it into the file's `_luv` column and marks the commit `#luvcol`
      luvIdx: Int = -1,
      // declared variant.shred paths: (schema idx of the variant column,
      // spec index for the synthetic #stats position, JSON path, typed
      // extraction domain) — see ManifestShred
      shred: Array[(Int, Int, String, DataType)] = Array.empty):
      DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val file = new Path(new Path(path, stagingName), name)
      private val fs: FileSystem = file.getFileSystem(conf.value)
      private val parquet = ManifestParquet.isParquet(name.stripSuffix(".tmp"))
      private val withRid = ridIdx >= 0 || ridFromMeta
      private val withLuv = luvIdx >= 0 || ridFromMeta
      require((!withRid && !withLuv) || parquet,
        "row-id materialization needs the parquet payload (lineage " +
          "tables pin it at enable time)")
      private val csvOut =
        if (parquet) null else new java.io.PrintWriter(fs.create(file, true))
      private val pqOut =
        if (parquet) ManifestParquet.createWriter(file, schema, conf.value,
          withRid = withRid, withLuv = withLuv)
        else null
      // projection [data columns…, carried _row_id, carried _luv] → the
      // writer's (stored schema + _rid [+ _luv]) layout
      private val ridProj: org.apache.spark.sql.catalyst.ProjectingInternalRow =
        if (ridIdx < 0) null
        else org.apache.spark.sql.catalyst.ProjectingInternalRow(
          StructType((schema.fields :+
            org.apache.spark.sql.types.StructField("_rid", LongType,
              nullable = true)) ++
            (if (luvIdx >= 0)
              Seq(org.apache.spark.sql.types.StructField("_luv",
                org.apache.spark.sql.types.IntegerType, nullable = true))
             else Seq.empty)),
          ((0 until schema.length) :+ ridIdx) ++
            (if (luvIdx >= 0) Seq(luvIdx) else Seq.empty))
      private var closed = false
      private val csvArity =
        schema.indices.map(ManifestFiles.physPos(schema, _))
          .foldLeft(-1)(math.max) + 1
      private var rows = 0L
      private val attempt = org.apache.spark.TaskContext.get().attemptNumber()

      // Per-column stats tracked AS ROWS STREAM THROUGH (no second pass):
      // min/max in the column's canonical comparison domain + null count.
      // Stats raw values are ALWAYS `String.valueOf` of the field (the
      // `#stats` codec), independent of the payload format.
      private val nulls = new Array[Long](schema.length)
      private val mins = new Array[Any](schema.length)
      private val maxs = new Array[Any](schema.length)
      private val rawMins = new Array[String](schema.length)
      private val rawMaxs = new Array[String](schema.length)
      // parquet path: specialized per-column trackers (no boxing/Option/
      // type-dispatch per value — see ManifestColTrackers); the CSV path
      // keeps trackStats, whose raw strings its row codec needs anyway
      private val colTrackers: Array[ManifestColTrackers.Tracker] =
        schema.fields.map(f => ManifestColTrackers.forType(f.dataType))

      // NESTED LEAF stats (round 12): orderable leaves reachable through
      // STRUCTS get their own bounds, keyed by dotted position paths —
      // (storage key, getStruct steps as (ordinal, numFields), leaf
      // ordinal, leaf type). A null struct anywhere on the path counts
      // as a null leaf (what a row predicate would see).
      private val leaves: Array[(String, Array[(Int, Int)], Int, DataType)] = {
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[(String, Array[(Int, Int)], Int, DataType)]
        def walk(st: StructType, keyPrefix: String,
            steps: List[(Int, Int)]): Unit =
          st.fields.zipWithIndex.foreach { case (f, i) =>
            f.dataType match {
              case inner: StructType =>
                walk(inner, s"$keyPrefix.$i", steps :+ (i -> inner.length))
              case dt if ManifestSkip.statsCapable(dt) =>
                buf += ((s"$keyPrefix.$i", steps.toArray, i, dt))
              case _ => () // arrays/maps: no stable leaf identity
            }
          }
        schema.indices.foreach { i =>
          schema(i).dataType match {
            case st0: StructType =>
              walk(st0, ManifestFiles.physPos(schema, i).toString,
                List(i -> st0.length))
            case _ => ()
          }
        }
        buf.toArray
      }
      private val leafNulls = new Array[Long](leaves.length)
      private val leafMins = new Array[Any](leaves.length)
      private val leafMaxs = new Array[Any](leaves.length)
      private val leafRawMins = new Array[String](leaves.length)
      private val leafRawMaxs = new Array[String](leaves.length)

      private def trackLeaves(r: InternalRow): Unit = {
        var li = 0
        while (li < leaves.length) {
          val (_, steps, ord, dt) = leaves(li)
          var cur: org.apache.spark.sql.catalyst.expressions.SpecializedGetters = r
          var nul = false
          var si = 0
          while (si < steps.length && !nul) {
            val (o, n) = steps(si)
            if (cur.isNullAt(o)) nul = true
            else cur = cur.getStruct(o, n)
            si += 1
          }
          if (nul || cur.isNullAt(ord)) leafNulls(li) += 1
          else {
            val v = cur.get(ord, dt)
            ManifestSkip.normalize(dt, v).foreach { nv =>
              val kept = nv match {
                case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
                case other => other
              }
              if (leafMins(li) == null || ordered(kept, leafMins(li)) < 0) {
                leafMins(li) = kept
                leafRawMins(li) = String.valueOf(v)
              }
              if (leafMaxs(li) == null || ordered(kept, leafMaxs(li)) > 0) {
                leafMaxs(li) = kept
                leafRawMaxs(li) = String.valueOf(v)
              }
            }
          }
          li += 1
        }
      }
      // declared-NDV sketches: one register set per tracked column
      private val ndvRegs: Array[Array[Byte]] =
        Array.fill(ndvPos.length)(ManifestNdv.emptyRegisters())
      // monomorphic accessors, dispatched once per column (round 17 —
      // the ManifestColTrackers pattern applied to sketch maintenance)
      private val ndvHash: Array[(InternalRow, Int) => Long] =
        ndvPos.map(i => ManifestNdv.hashGetter(schema(i).dataType))

      private val histTrackers: Array[ManifestHist.Tracker] =
        Array.fill(histPos.length)(new ManifestHist.Tracker)
      private val histGet: Array[(InternalRow, Int) => Double] =
        histPos.map(i => ManifestHist.doubleGetter(schema(i).dataType))

      // VARIANT SHREDDING (round 16 — ManifestShred): one bound
      // variant_get per declared path, evaluated per row with
      // failOnError so a file whose data would THROW at query time
      // records NO stats (skipping must never swallow an error); a
      // missing path / true null counts as null, exactly what the
      // query's comparison sees
      private val shredEvals:
          Array[org.apache.spark.sql.catalyst.expressions.Expression] =
        shred.map { case (idx, _, path, dt) =>
          org.apache.spark.sql.catalyst.expressions.variant.VariantGet(
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              idx, org.apache.spark.sql.types.VariantType, nullable = true),
            org.apache.spark.sql.catalyst.expressions.Literal(
              org.apache.spark.unsafe.types.UTF8String.fromString(path),
              StringType),
            dt, failOnError = true, timeZoneId = Some("UTC"))
        }
      private val shredNulls = new Array[Long](shred.length)
      private val shredMins = new Array[Any](shred.length)
      private val shredMaxs = new Array[Any](shred.length)
      private val shredRawMins = new Array[String](shred.length)
      private val shredRawMaxs = new Array[String](shred.length)
      private val shredDirty = new Array[Boolean](shred.length)

      private def trackShred(r: InternalRow): Unit = {
        var si = 0
        while (si < shred.length) {
          if (!shredDirty(si)) {
            val dt = shred(si)._4
            val v = try shredEvals(si).eval(r)
              catch { case _: Exception => shredDirty(si) = true; null }
            if (!shredDirty(si)) {
              if (v == null) shredNulls(si) += 1
              else ManifestSkip.normalize(dt, v).foreach { nv =>
                val kept = nv match {
                  case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
                  case other => other
                }
                if (shredMins(si) == null || ordered(kept, shredMins(si)) < 0) {
                  shredMins(si) = kept
                  shredRawMins(si) = String.valueOf(v)
                }
                if (shredMaxs(si) == null || ordered(kept, shredMaxs(si)) > 0) {
                  shredMaxs(si) = kept
                  shredRawMaxs(si) = String.valueOf(v)
                }
              }
            }
          }
          si += 1
        }
      }

      private def trackHist(r: InternalRow): Unit = {
        var hi = 0
        while (hi < histPos.length) {
          val i = histPos(hi)
          if (!r.isNullAt(i))
            histTrackers(hi).add(histGet(hi)(r, i))
          hi += 1
        }
      }

      private def trackNdv(r: InternalRow): Unit = {
        var ni = 0
        while (ni < ndvPos.length) {
          val i = ndvPos(ni)
          if (!r.isNullAt(i))
            ManifestNdv.add(ndvRegs(ni), ndvHash(ni)(r, i))
          ni += 1
        }
      }

      // sortedBy verification: rows must arrive non-decreasing in the
      // sort column (nulls first, matching ASC NULLS FIRST) for the file
      // to earn its `#sorted` mark
      private var sortedOk = sortPos.isDefined
      private var prevSortKey: Any = _
      private var seenNonNullSortKey = false
      private var seenNullSortKey = false

      /** Track column i's stats for value `v`; returns the raw stat
        * string (computed lazily for parquet — only CSV needs it per
        * row, stats only on a min/max update). */
      private def trackStats(i: Int, v: Any, dt: DataType,
          needRaw: Boolean): String = {
        val s0 = if (needRaw) String.valueOf(v) else null
        ManifestSkip.normalize(dt, v).foreach { nv =>
          // UTF8String from an UnsafeRow points into a REUSED buffer —
          // normalize returns it as-is, so clone before retaining.
          val kept = nv match {
            case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
            case other => other
          }
          if (mins(i) == null || ordered(kept, mins(i)) < 0) {
            mins(i) = kept
            rawMins(i) = if (s0 != null) s0 else String.valueOf(v)
          }
          if (maxs(i) == null || ordered(kept, maxs(i)) > 0) {
            maxs(i) = kept
            rawMaxs(i) = if (s0 != null) s0 else String.valueOf(v)
          }
        }
        s0
      }

      // carried-id holder for the COW metadata path: [data…] ++ [rid]
      private val ridHolder =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      private val metaJoined =
        new org.apache.spark.sql.catalyst.expressions.JoinedRow

      /** COW row-level plans (ReplaceData with metadata attrs): `meta`
        * is the [_file, _row_id, _last_updated_version] projection of
        * this row — materialize slot 1 as the file's `_rid` (NULL for
        * MERGE-inserted rows, which later resolve to the file's own
        * fresh range) and slot 2 as `_luv` (NULLIFIED by Spark's
        * preserve-on-update seam for UPDATED rows, which resolve to
        * this commit's version). */
      override def write(meta: InternalRow, r: InternalRow): Unit =
        if (!ridFromMeta || meta == null || meta.numFields < 2) write(r)
        else {
          ridHolder.update(0,
            if (meta.isNullAt(1)) null
            else java.lang.Long.valueOf(meta.getLong(1)))
          ridHolder.update(1,
            if (meta.numFields < 3 || meta.isNullAt(2)) null
            else java.lang.Integer.valueOf(meta.getInt(2)))
          writeRow(r, metaJoined(r, ridHolder))
        }

      override def write(r: InternalRow): Unit =
        writeRow(r,
          if (ridIdx >= 0) { ridProj.project(r); ridProj }
          else if (ridFromMeta) {
            // no metadata delivered for this row: mint-at-read semantics
            ridHolder.update(0, null)
            ridHolder.update(1, null)
            metaJoined(r, ridHolder)
          } else r)

      private def writeRow(r: InternalRow, out: InternalRow): Unit = {
        if (injectFailure && attempt == 0 && rows == 2)
          throw new RuntimeException("injected write failure")
        if (parquet) {
          var i = 0
          while (i < schema.length) {
            if (r.isNullAt(i)) nulls(i) += 1
            else {
              val t = colTrackers(i)
              if (t != null) t.add(r, i)
            }
            i += 1
          }
          pqOut.write(out)
        } else {
          // One slot per PHYSICAL position (== schema index until a DROP
          // diverges them; a dropped column's slot stays `\N` so old and
          // new files agree on the layout). NULL encodes as `\N` (never
          // a legal numeric/boolean token; a real STRING that looks like
          // the marker gains one backslash, stripped symmetrically at
          // read — ManifestCsv.encode/parse).
          val slots = Array.fill(csvArity)(ManifestCsv.NullToken)
          var i = 0
          while (i < schema.length) {
            val dt = schema(i).dataType
            if (r.isNullAt(i)) nulls(i) += 1
            else {
              val v = r.get(i, dt)
              slots(ManifestFiles.physPos(schema, i)) =
                ManifestCsv.encode(trackStats(i, v, dt, needRaw = true), dt)
            }
            i += 1
          }
          csvOut.println(slots.mkString(","))
        }
        if (leaves.nonEmpty) trackLeaves(r)
        if (ndvPos.nonEmpty) trackNdv(r)
        if (histPos.nonEmpty) trackHist(r)
        if (shred.nonEmpty) trackShred(r)
        sortPos.foreach { case (p, desc, nullsLast) =>
          if (sortedOk) {
            if (r.isNullAt(p)) {
              // NULLS FIRST: a null after any non-null breaks order;
              // NULLS LAST: nulls may only form the tail
              if (!nullsLast && seenNonNullSortKey) sortedOk = false
              seenNullSortKey = true
            } else {
              if (nullsLast && seenNullSortKey) sortedOk = false
              val v = ManifestSkip.normalize(schema(p).dataType,
                r.get(p, schema(p).dataType)) match {
                case Some(u: org.apache.spark.unsafe.types.UTF8String) => u.clone()
                case Some(other) => other
                case None => null
              }
              if (v == null) sortedOk = false // unorderable type
              else {
                if (seenNonNullSortKey) {
                  val c = ordered(prevSortKey, v)
                  if (if (desc) c < 0 else c > 0) sortedOk = false
                }
                prevSortKey = v
                seenNonNullSortKey = true
              }
            }
          }
        }
        rows += 1
      }

      // the ONE canonical comparator — shared with the skip evaluator so
      // recorded min/max and evaluated bounds can never order differently
      private def ordered(a: Any, b: Any): Int = ManifestSkip.cmp(a, b)

      private def closeOut(): Unit = if (!closed) {
        closed = true
        if (parquet) pqOut.close() else csvOut.close()
      }

      override def commit(): WriterCommitMessage = {
        closeOut()
        // fold the parquet path's specialized trackers into the shared
        // raw-bound arrays the stats assembly below reads
        if (parquet) {
          var i = 0
          while (i < schema.length) {
            val t = colTrackers(i)
            if (t != null) { rawMins(i) = t.rawMin; rawMaxs(i) = t.rawMax }
            i += 1
          }
        }
        val bytes = fs.getFileStatus(file).getLen
        // Non-orderable columns (arrays / binary / structs — parquet
        // payload only) get NO stats entry: bounds are meaningless and
        // a (nulls, absent, absent) record would collide with the
        // all-null pattern. Absent stats = never skipped, the format's
        // standing conservative contract.
        val stats = schema.indices
          .filter(i => ManifestSkip.statsCapable(schema(i).dataType))
          .map { i =>
          // String bounds truncate (Iceberg's prefix / prefix+increment
          // rule — ManifestFiles.truncLower/truncUpper) so the manifest
          // scales with file count, not value size; numerics are exact.
          val (mn, mx) =
            if (schema(i).dataType == StringType)
              (Option(rawMins(i)).map(ManifestFiles.truncLower),
                Option(rawMaxs(i)).flatMap(ManifestFiles.truncUpper))
            else (Option(rawMins(i)), Option(rawMaxs(i)))
          ManifestFiles.physPos(schema, i) ->
            ManifestFiles.ColStats(nulls(i), mn, mx)
        }
        val shredStats = shred.indices.collect {
          case si if !shredDirty(si) =>
            val dt = shred(si)._4
            val (mn, mx) =
              if (dt == StringType)
                (Option(shredRawMins(si)).map(ManifestFiles.truncLower),
                  Option(shredRawMaxs(si)).flatMap(ManifestFiles.truncUpper))
              else (Option(shredRawMins(si)), Option(shredRawMaxs(si)))
            (ManifestShred.PosBase + shred(si)._2) ->
              ManifestFiles.ColStats(shredNulls(si), mn, mx)
        }
        val nested = leaves.indices.map { li =>
          val dt = leaves(li)._4
          val (mn, mx) =
            if (dt == StringType)
              (Option(leafRawMins(li)).map(ManifestFiles.truncLower),
                Option(leafRawMaxs(li)).flatMap(ManifestFiles.truncUpper))
            else (Option(leafRawMins(li)), Option(leafRawMaxs(li)))
          leaves(li)._1 -> ManifestFiles.ColStats(leafNulls(li), mn, mx)
        }
        val ndv = ndvPos.indices.map(ni =>
          ManifestFiles.physPos(schema, ndvPos(ni)) -> ndvRegs(ni))
        val hist = histPos.indices.collect {
          case hi if !histTrackers(hi).isEmpty =>
            ManifestFiles.physPos(schema, histPos(hi)) ->
              histTrackers(hi).result()
        }
        FileCommitted(name, rows, bytes, stats ++ shredStats, bucket,
          sortedOk, nested, ndv, hist, ridCol = withRid, luvCol = withLuv)
      }
      override def abort(): Unit = {
        try closeOut() catch { case _: Exception => }
        fs.delete(file, false)
      }
      override def close(): Unit = closeOut()
    }
}

private[sources] class ManifestStreamWriterFactory(path: String,
    stagingName: String, schema: StructType, conf: SerializableHadoopConf,
    format: String,
    // declared days/months/identity layout: 24/7 streaming ingest lands
    // value-pure files too, so retention deletes stay metadata-only on
    // streamed history (round 12; the epoch prefix keeps the abort
    // sweep's per-epoch selector working)
    partSpec: Seq[(Int, String)] = Seq.empty,
    checks: Seq[(String, String,
      org.apache.spark.sql.catalyst.expressions.Expression)] = Seq.empty,
    upsertKeys: Array[Int] = Array.empty,
    ndvPos: Array[Int] = Array.empty,
    histPos: Array[Int] = Array.empty,
    shred: Array[(Int, Int, String, DataType)] = Array.empty)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val base =
      if (partSpec.isEmpty)
        ManifestWriters.create(path, stagingName,
          f"part-e$epochId-$partitionId%05d-$taskId${ManifestWriters.ext(format)}.tmp",
          schema, conf, injectFailure = false, ndvPos = ndvPos,
          histPos = histPos, shred = shred)
      else
        new PartitionSplitWriter(path, stagingName, schema, conf, format,
          f"part-e$epochId-$partitionId%05d-$taskId",
          partSpec.map { case (idx, kind) =>
            (idx, kind, schema(idx).dataType) },
          ndvPos = ndvPos, histPos = histPos, shred = shred)
    val teed =
      if (upsertKeys.isEmpty) base
      // the epoch-prefixed staged name keeps abort's per-epoch sweep
      // and the replayed-epoch cleanup working unchanged
      else ManifestEqDeletes.tee(base, schema, upsertKeys, path, stagingName,
        f"part-e$epochId-$partitionId%05d-$taskId.eqdel.tmp", conf)
    ManifestChecks.wrap(teed, checks, schema)
  }
}

private[sources] class ManifestWriterFactory(path: String, stagingName: String,
    failPartition: Int, schema: StructType,
    conf: SerializableHadoopConf,
    // bucketed write: the task's partitionId IS its bucket id (the
    // required distribution pinned partitioning to pmod(murmur3(col), n))
    recordBucket: Boolean = false,
    sortPos: Option[(Int, Boolean, Boolean)] = None,
    format: String = "parquet",
    // (schema index, kind) per declared days/months/identity transform,
    // in declared order: the task splits its rows into one staged file
    // per COMPOSITE partition value
    partSpec: Seq[(Int, String)] = Seq.empty,
    // bound CHECK constraints, enforced on every row before it reaches
    // any inner writer (see ManifestChecks)
    checks: Seq[(String, String,
      org.apache.spark.sql.catalyst.expressions.Expression)] = Seq.empty,
    // CDC upsert key indices — wraps each writer with the equality-
    // delete tee (see ManifestEqDeletes.tee)
    upsertKeys: Array[Int] = Array.empty,
    // declared stats.ndv.columns as schema indices (per-file sketches)
    ndvPos: Array[Int] = Array.empty,
    // declared stats.histogram.columns as schema indices (ManifestHist)
    histPos: Array[Int] = Array.empty,
    // row lineage: incoming-row index of the carried `_row_id` (-1 none)
    ridIdx: Int = -1,
    // row lineage via the COW metadata channel
    ridFromMeta: Boolean = false,
    // `_last_updated_version`: incoming-row index of the carried value
    luvIdx: Int = -1,
    // declared variant.shred paths (ManifestShred)
    shred: Array[(Int, Int, String, DataType)] = Array.empty)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    val base =
      if (partSpec.isEmpty)
        ManifestWriters.create(path, stagingName,
          f"part-$partitionId%05d-$taskId${ManifestWriters.ext(format)}.tmp",
          schema, conf,
          injectFailure = partitionId == failPartition,
          bucket = if (recordBucket) partitionId else -1,
          sortPos = sortPos, ndvPos = ndvPos, histPos = histPos,
          ridIdx = ridIdx, ridFromMeta = ridFromMeta, luvIdx = luvIdx,
          shred = shred)
      else
        new PartitionSplitWriter(path, stagingName, schema, conf, format,
          f"part-$partitionId%05d-$taskId",
          partSpec.map { case (idx, kind) =>
            (idx, kind, schema(idx).dataType) },
          sortPos = sortPos,
          // MIXED layout (bucket + transforms): each task IS one bucket
          // (clustered distribution), so every split file inherits the
          // task's bucket id — files land pure on both dimensions
          bucket = if (recordBucket) partitionId else -1,
          ndvPos = ndvPos, histPos = histPos, ridIdx = ridIdx,
          ridFromMeta = ridFromMeta, luvIdx = luvIdx, shred = shred)
    val teed =
      if (upsertKeys.isEmpty) base
      else ManifestEqDeletes.tee(base, schema, upsertKeys, path, stagingName,
        f"part-$partitionId%05d-$taskId.eqdel.tmp", conf)
    ManifestChecks.wrap(teed, checks, schema)
  }
}

/** Partition-splitting task writer for days/months/identity layouts:
  * routes each row to the staged file of its partition value, opening
  * writers on demand. The write's required RANGE distribution +
  * in-partition sort mean values arrive clustered, so in practice one
  * file is open at a time and the per-task file count is the number of
  * distinct values the task's range covers — at 100 TB a day-laid
  * INSERT lands ~one file per day regardless of parallelism, which is
  * exactly the layout `DELETE WHERE ts < cutoff` needs to stay
  * metadata-only. Rows with a NULL partition value get their own file.
  * Each inner writer is the standard staged writer (stats, format,
  * abort semantics all shared); the task's commit message carries every
  * file it produced. */
private[sources] class PartitionSplitWriter(path: String, stagingName: String,
    schema: StructType, conf: SerializableHadoopConf, format: String,
    namePrefix: String,
    specs: Seq[(Int, String, DataType)],
    // declared write.sort-order's leading column: rows arrive ordered
    // (partition cols, sort cols), so each per-value inner file streams
    // non-decreasing in it and earns its own verified `#sorted` mark
    sortPos: Option[(Int, Boolean, Boolean)] = None,
    // ≥0 on a mixed bucket+transform layout: the task's bucket id, which
    // every split file records via its `#bucket` line
    bucket: Int = -1,
    ndvPos: Array[Int] = Array.empty,
    histPos: Array[Int] = Array.empty,
    ridIdx: Int = -1,
    ridFromMeta: Boolean = false,
    luvIdx: Int = -1,
    shred: Array[(Int, Int, String, DataType)] = Array.empty)
    extends DataWriter[InternalRow] {

  private val writers = scala.collection.mutable
    .LinkedHashMap.empty[List[Long], DataWriter[InternalRow]]
  private val NullKey = Long.MinValue
  private val specsArr = specs.toArray

  /** Partition key of a row on ONE transform column: days/months map
    * the temporal value to its day/month index (timestamps via floorDiv
    * so pre-epoch values land in the right day); identity keys
    * numerics/dates directly and strings/other orderables via a stable
    * hash (the key only routes rows to files — the VALUE-pure file's
    * stats are what proofs use, so hash collisions merely co-locate two
    * values in one file, which is still a correct, slightly weaker
    * layout). Composite layouts route on the List of per-column keys. */
  private def keyAt(row: InternalRow, colIdx: Int, kind: String,
      dt: DataType): Long = {
    if (row.isNullAt(colIdx)) return NullKey
    val dayOf: Long = dt match {
      case DateType => row.getInt(colIdx).toLong
      case TimestampType | TimestampNTZType =>
        Math.floorDiv(row.getLong(colIdx), 86400000000L)
      case _ => 0L
    }
    kind match {
      // the ONE shared transform math (also the catalog's V2 function
      // and the scan's group derivation — three consumers, one formula)
      case "hours" =>
        GraftTimeTransformFunction.hourOf(row.getLong(colIdx)).toLong
      case k if GraftTimeTransformFunction.TimeKinds(k) =>
        GraftTimeTransformFunction.dayOf(k, dayOf).toLong
      case k if GraftTruncateFunction.widthOf(k).isDefined =>
        val w = GraftTruncateFunction.widthOf(k).get
        dt match {
          case LongType => GraftTruncateFunction.truncLong(w, row.getLong(colIdx))
          case IntegerType =>
            GraftTruncateFunction.truncLong(w, row.getInt(colIdx).toLong)
          // routing key only — the file's own stats prove the layout, so
          // a hash collision merely co-locates two prefixes (still
          // correct, the scan degrades that group)
          case StringType => GraftTruncateFunction
            .truncStr(w, row.getUTF8String(colIdx)).hashCode.toLong
          case _ => 0L
        }
      case _ => dt match { // identity
        case LongType => row.getLong(colIdx)
        case IntegerType => row.getInt(colIdx).toLong
        case ShortType => row.getShort(colIdx).toLong
        case ByteType => row.getByte(colIdx).toLong
        case DateType => row.getInt(colIdx).toLong
        case TimestampType | TimestampNTZType => row.getLong(colIdx)
        case BooleanType => if (row.getBoolean(colIdx)) 1L else 0L
        case StringType => row.getUTF8String(colIdx).hashCode.toLong
        case DoubleType =>
          java.lang.Double.hashCode(row.getDouble(colIdx)).toLong
        case FloatType => java.lang.Float.hashCode(row.getFloat(colIdx)).toLong
        case d: DecimalType =>
          row.getDecimal(colIdx, d.precision, d.scale).hashCode.toLong
        case _ => 0L // unreachable: DDL requires an orderable primitive
      }
    }
  }

  private def key(row: InternalRow): List[Long] =
    specsArr.map { case (i, k, dt) => keyAt(row, i, k, dt) }.toList

  private def writerFor(row: InternalRow): DataWriter[InternalRow] =
    writers.getOrElseUpdate(key(row), {
      val seq = writers.size
      ManifestWriters.create(path, stagingName,
        s"$namePrefix-s$seq${ManifestWriters.ext(format)}.tmp",
        schema, conf, injectFailure = false, bucket = bucket,
        sortPos = sortPos, ndvPos = ndvPos, histPos = histPos,
        ridIdx = ridIdx, ridFromMeta = ridFromMeta, luvIdx = luvIdx,
        shred = shred)
    })

  override def write(row: InternalRow): Unit = writerFor(row).write(row)

  // COW metadata channel (row lineage): route by the DATA row, forward
  // the metadata row to the inner writer — the default 1-arg fallback
  // would silently drop every carried id
  override def write(meta: InternalRow, row: InternalRow): Unit =
    writerFor(row).write(meta, row)

  override def commit(): WriterCommitMessage =
    FilesCommitted(writers.values.toSeq.map(
      _.commit().asInstanceOf[FileCommitted]))

  override def abort(): Unit = writers.values.foreach { w =>
    try w.abort() catch { case _: Exception => }
  }

  override def close(): Unit = writers.values.foreach(_.close())
}

/** STREAMING write half: each epoch is one snapshot commit with
  * EXACTLY-ONCE dedup via a `#txn,<queryId>,<epoch>` marker line that
  * rides the atomically-claimed version file (Delta's SetTransaction
  * idea — there is no crash window between "data visible" and "epoch
  * recorded", they are the same file). A replayed epoch (restart from
  * an older checkpoint state, task-level retry storm) sees its marker
  * in the predecessor snapshot and cleans up its staged files instead
  * of double-committing. Append output mode only. */
private[sources] class ManifestStreamingWrite(path: String, queryId: String,
    schema: StructType, conf: SerializableHadoopConf,
    format: String = "parquet",
    // 24/7 WRITE-AUDIT-PUBLISH: a stream staged on a branch keeps main
    // clean while an auditor periodically fast_forwards the vetted
    // prefix; the `#txn` exactly-once markers ride the branch chain
    branch: Option[String] = None,
    // streaming CDC upsert: key indices for the equality-delete tee —
    // each epoch's delete file applies to every PRIOR epoch's rows
    upsertKeys: Seq[Int] = Seq.empty)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  private val stagingName = s".staging-$queryId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    // declared days/months/identity layout (see ManifestBatchWrite):
    // each micro-batch's tasks split output per partition value, so
    // streamed history keeps retention deletes metadata-only. Without a
    // demanded distribution the per-epoch file count is tasks × values
    // touched this epoch — for time layouts an epoch usually touches
    // one or two days, so the cost stays near one file per task.
    val lines =
      try ManifestFiles.latestLines(
        new Path(path).getFileSystem(conf.value), new Path(path))
      catch { case _: Exception => Array.empty[String] }
    val partSpec: Seq[(Int, String)] =
      ManifestFiles.partConfs(lines).flatMap { case (pos, kind) =>
        ManifestFiles.fieldAtPhys(schema, pos).map(idx => (idx, kind)) }
    ManifestParquet.setBloomCols(conf.value,
      ManifestFiles.bloomFromLines(lines))
    new ManifestStreamWriterFactory(path, stagingName, schema, conf, format,
      partSpec,
      checks = ManifestChecks.bind(SparkSession.active, schema,
        ManifestFiles.checksFromLines(lines)),
      upsertKeys = upsertKeys.toArray,
      ndvPos = (ManifestFiles.ndvFromLines(lines) ++
          ManifestFiles.histDeclFromLines(lines)).distinct
        .flatMap(ManifestFiles.fieldAtPhys(schema, _)).toArray,
      histPos = ManifestFiles.histDeclFromLines(lines)
        .flatMap(ManifestFiles.fieldAtPhys(schema, _)).toArray,
      shred = ManifestShred.writerSpecs(lines, schema))
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    val staging = new Path(dir, stagingName)
    val already = ManifestFiles.committedEpoch(
      if (branch.isDefined) ManifestFiles.linesOf(fs, dir, None, branch)
      else ManifestFiles.latestLines(fs, dir), queryId).exists(_ >= epochId)
    if (already) {
      def sweep(m: WriterCommitMessage): Unit = m match {
        case f: FileCommitted =>
          fs.delete(new Path(staging, f.name), false)
        case FilesCommitted(files) => files.foreach(sweep)
        case ManifestEqDeletes.UpsertCommitted(inner, del, _) =>
          sweep(inner)
          del.foreach(d => fs.delete(new Path(staging, d), false))
      }
      messages.foreach(sweep)
      return
    }
    def landOne(m: FileCommitted): Seq[String] = {
      val fin = m.name.stripSuffix(".tmp")
      val ok = fs.rename(new Path(staging, m.name), new Path(dir, fin))
      require(ok, s"staged file ${m.name} vanished before commit")
      Seq(s"$fin,${m.rows}",
        ManifestFiles.statsLine(fin, m.bytes, m.stats, m.nestedStats)) ++
        (if (m.ndv.nonEmpty) Seq(ManifestNdv.line(fin, m.ndv)) else Nil) ++
        (if (m.hist.nonEmpty) Seq(ManifestHist.line(fin, m.hist)) else Nil)
    }
    val eqdelFins = messages.collect {
      case ManifestEqDeletes.UpsertCommitted(_, Some(tmp), _) =>
        val fin = tmp.stripSuffix(".tmp")
        require(fs.rename(new Path(staging, tmp), new Path(dir, fin)),
          s"staged equality-delete file $tmp vanished before commit")
        fin
    }
    val fresh = messages.flatMap {
      case ManifestEqDeletes.UpsertCommitted(inner, _, _) => inner match {
        case f: FileCommitted => landOne(f)
        case FilesCommitted(files) => files.flatMap(landOne)
        case other => throw new IllegalStateException(other.toString)
      }
      case f: FileCommitted => landOne(f)
      case FilesCommitted(files) => files.flatMap(landOne)
    }
    val freshNames = fresh.filterNot(_.startsWith("#"))
      .map(l => l.substring(0, l.lastIndexOf(',')))
    val eqPositions = upsertKeys.map(k =>
      ManifestFiles.physPos(schema, k)).mkString(";")
    ManifestFiles.publishSnapshotV(fs, conf.value, dir, (previous, version) => {
      val eqdels = eqdelFins.map(f => s"#eqdels,$f,$eqPositions,$version")
      val born: Array[String] =
        if (ManifestFiles.isMergeOnRead(previous) || eqdelFins.nonEmpty)
          freshNames.map(n => ManifestFiles.bornLine(n, version))
        else Array.empty
      previous.filterNot(_.startsWith(s"#txn,$queryId,")) ++ eqdels ++
        fresh ++ born :+ s"#txn,$queryId,$epochId"
    }, schema, branch)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    val staging = new Path(dir, stagingName)
    if (fs.exists(staging)) fs.listStatus(staging).foreach { st =>
      if (st.getPath.getName.startsWith(s"part-e$epochId-"))
        fs.delete(st.getPath, false)
    }
  }
}
