package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport, VectorizedParquetRecordReader}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

/** PARQUET data layer for the manifest table format (round 11; until now
  * rows serialized as CSV lines — the metadata layer was Iceberg-class
  * while the data layer parsed text). New files land as real parquet
  * through Spark's own `ParquetWriteSupport` and read back through its
  * `VectorizedParquetRecordReader` — the exact scan stack the reference
  * builds on (`sql/core/.../parquet/ParquetFileFormat.scala:51`,
  * `VectorizedParquetRecordReader.java:48`) — so column pruning is real
  * storage I/O pruning (unread columns are never decoded OR fetched),
  * values are dictionary/RLE-encoded and compressed, and the columnar
  * scan path hands the engine the reader's own 4K-row batches with zero
  * re-parsing.
  *
  * Format is a PER-FILE property, decided by the entry name's extension
  * (`.parquet` vs anything else = CSV): old snapshots stay readable
  * forever, and a table whose history mixes CSV commits with parquet
  * commits reads both in one scan. New writes default to parquet;
  * `option("format", "csv")` pins the legacy payload.
  *
  * Columns are stored under POSITIONAL names (`c<physical position>`),
  * never the schema names: `RENAME COLUMN` stays a metadata-only commit
  * (the reader maps requested schema fields to positional names at plan
  * time), and a column added by `ALTER TABLE ADD COLUMN` is simply
  * missing from pre-evolution files — the vectorized reader null-fills
  * missing requested fields, the same add-column semantics the CSV
  * reader implements with positional null-fill.
  */
private[sources] object ManifestParquet {

  /** The stored (positional) column name of schema position `i`. */
  def colName(i: Int): String = "c" + i

  def isParquet(entryName: String): Boolean = entryName.endsWith(".parquet")

  /** Write-side parquet schema: the table schema with positional names,
    * everything nullable (nullability is enforced by the engine above,
    * and relaxed storage nullability keeps old/new files union-able). */
  private def storedSchema(schema: StructType): StructType =
    StructType(schema.fields.zipWithIndex.map { case (f, i) =>
      StructField(colName(ManifestFiles.physPos(schema, i)), f.dataType,
        nullable = true)
    })

  /** ParquetWriteSupport asserts these keys PRESENT (Spark's write path
    * always sets them from SQLConf). FORCE-set, don't default-fill: the
    * storage layout of manifest data files is the FORMAT's contract, not
    * the writing session's (and a session conf copied into the Hadoop
    * conf as the literal string "null" would crash `.toBoolean`). */
  private def writerConf(base: Configuration, schema: StructType): Configuration = {
    val conf = new Configuration(base)
    ParquetWriteSupport.setSchema(storedSchema(schema), conf)
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    conf
  }

  private class RowWriterBuilder(out: org.apache.parquet.io.OutputFile)
      extends org.apache.parquet.hadoop.ParquetWriter.Builder[
        InternalRow, RowWriterBuilder](out) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(conf: Configuration):
        org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  /** Open a parquet writer for rows of `schema` at `file`. Snappy, the
    * engine default — dictionary + RLE come with the format. */
  def createWriter(file: Path, schema: StructType,
      base: Configuration): org.apache.parquet.hadoop.ParquetWriter[InternalRow] = {
    val conf = writerConf(base, schema)
    new RowWriterBuilder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, conf))
      .withConf(conf)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE)
      .build()
  }

  /** Reader-side conf: requested schema (positional names) + the
    * semantics booleans Spark's own parquet scan pins. */
  private def readerConf(base: Configuration,
      requested: StructType): Configuration = {
    val conf = new Configuration(base)
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, requested.json)
    conf.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, requested.json)
    conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    conf.set("spark.sql.parquet.binaryAsString", "false")
    conf.set("spark.sql.parquet.int96AsTimestamp", "true")
    conf.set("spark.sql.caseSensitive", "false")
    conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    conf.set("spark.sql.parquet.ignoreVariantAnnotation", "false")
    conf
  }

  /** The vectorized reader over ONE manifest parquet file, initialized
    * the way Spark's parquet scan does it: requested schema in the conf,
    * `_file` injected as a constant partition column, missing requested
    * columns null-filled by the reader itself. */
  def openVectorized(part: ManifestInputPartition, fullSchema: StructType,
      required: StructType, base: Configuration,
      capacity: Int): (VectorizedParquetRecordReader, Array[Int]) = {
    val dataFields = required.fields.filter(_.name != "_file")
    val requested = StructType(dataFields.map(f =>
      StructField(
        colName(ManifestFiles.physPos(fullSchema, fullSchema.fieldIndex(f.name))),
        f.dataType, nullable = true)))
    val conf = readerConf(base, requested)
    val file = new Path(part.file)
    val len = file.getFileSystem(conf).getFileStatus(file).getLen
    // mapred.FileSplit (extends the mapreduce one) — the reader base
    // class downcasts to it for its location-info path
    val split = new org.apache.hadoop.mapred.FileSplit(
      file, 0, len, Array.empty[String])
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapred.TaskAttemptID())
    val reader = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, capacity)
    try {
      reader.initialize(split, ctx)
      // `_file` rides as a constant partition column (appended after the
      // data columns — the same seam Spark uses for directory partitions)
      if (required.fieldNames.contains("_file"))
        reader.initBatch(
          new StructType().add("_file", StringType, nullable = false),
          new GenericInternalRow(Array[Any](UTF8String.fromString(part.name))))
    } catch { case t: Throwable => reader.close(); throw t }
    // Batch column j of the reader ↔ output position outMap.indexOf(j):
    // reader columns are the data fields in `required` order, then _file.
    var di = 0
    val outMap = required.fields.map { f =>
      if (f.name == "_file") dataFields.length else { val j = di; di += 1; j }
    }
    (reader, outMap)
  }

  def rowReader(part: ManifestInputPartition, fullSchema: StructType,
      required: StructType, conf: SerializableHadoopConf): PartitionReader[InternalRow] = {
    val (reader, outMap) = openVectorized(part, fullSchema, required,
      conf.value, 4096)
    val identity = outMap.sameElements(outMap.indices)
    val types = required.fields.map(_.dataType)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = reader.nextKeyValue()
      override def get(): InternalRow = {
        val row = reader.getCurrentValue.asInstanceOf[InternalRow]
        if (identity) row
        else {
          val out = new GenericInternalRow(outMap.length)
          var i = 0
          while (i < outMap.length) {
            out.update(i,
              if (row.isNullAt(outMap(i))) null else row.get(outMap(i), types(i)))
            i += 1
          }
          out
        }
      }
      override def close(): Unit = reader.close()
    }
  }

  def columnarReader(part: ManifestInputPartition, fullSchema: StructType,
      required: StructType, conf: SerializableHadoopConf): PartitionReader[ColumnarBatch] = {
    val (reader, outMap) = openVectorized(part, fullSchema, required,
      conf.value, 4096)
    reader.enableReturningBatches()
    val identity = outMap.sameElements(outMap.indices)
    new PartitionReader[ColumnarBatch] {
      override def next(): Boolean = reader.nextKeyValue()
      override def get(): ColumnarBatch = {
        val b = reader.getCurrentValue.asInstanceOf[ColumnarBatch]
        if (identity) b
        else {
          // column objects are READER-OWNED — the wrapper only reorders
          // references, and only the reader's close releases them
          val cols = outMap.map(b.column)
          new ColumnarBatch(
            cols.toArray[org.apache.spark.sql.vectorized.ColumnVector],
            b.numRows())
        }
      }
      override def close(): Unit = reader.close()
    }
  }
}
