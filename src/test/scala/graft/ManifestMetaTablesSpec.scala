package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Metadata tables over the manifest format (round 12 — Iceberg's
  * `db.t.files`/`t.snapshots`/`t.partitions` as `$`-suffixed
  * identifiers): driver-computed LocalScans over the snapshot's
  * metadata lines. They must reconcile exactly with the data they
  * describe, compose with time travel, and attribute partition values
  * only when the file's stats PROVE them (same proof as the SPJ group
  * derivation). */
class ManifestMetaTablesSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def freshCat(tag: String): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_meta_$tag").toString
    val cat = s"graft_meta_${tag}_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def mkDayTable(cat: String): Unit = {
    spark.sql(s"CREATE TABLE $cat.ev (k BIGINT, ts TIMESTAMP, region STRING) " +
      "PARTITIONED BY (days(ts), region)")
    spark.range(0, 400).select($"id".as("k"),
        (lit(1714521600L) + ($"id" % 3) * 86400L + $"id").cast("timestamp")
          .as("ts"),
        element_at(array(lit("apac"), lit("emea")),
          (($"id" / 3) % 2 + 1).cast("int")).as("region"))
      .repartition(5).writeTo(s"$cat.ev").append()
  }

  test("$files: one row per data file, reconciling row counts, formats, " +
    "and proven partition paths") {
    val (cat, root) = freshCat("files")
    mkDayTable(cat)
    val files = spark.table(s"$cat.`ev$$files`").collect()
    val onDisk = new java.io.File(s"$root/ev").listFiles()
      .map(_.getName).filter(_.startsWith("part-")).toSet
    assert(files.map(_.getString(0)).toSet == onDisk)
    assert(files.map(r => r.getLong(2)).sum == 400L)
    assert(files.forall(_.getString(1) == "parquet"))
    assert(files.forall(r => r.getLong(3) > 0L), "size_bytes populated")
    assert(files.forall(r => r.getLong(6) == 0L), "no deletes yet")
    // every writer-produced file proves its (day, region) partition
    files.foreach { r =>
      val p = r.getString(7)
      assert(p != null && p.matches("ts=\\d{4}-\\d{2}-\\d{2}/region=(apac|emea)"),
        s"partition path '$p'")
    }
    // a merge-on-read delete surfaces per-file delete_rows
    spark.sql(s"ALTER TABLE $cat.ev " +
      "SET TBLPROPERTIES('delete.mode'='merge-on-read')")
    spark.sql(s"DELETE FROM $cat.ev WHERE k % 50 = 7")
    val after = spark.table(s"$cat.`ev$$files`").collect()
    assert(after.map(_.getLong(6)).sum == 8L,
      s"expected 8 MOR-deleted rows, got ${after.map(_.getLong(6)).sum}")
  }

  test("$partitions: per-value aggregates typed by transform (days → " +
    "DATE), reconciling with a group-by of the data; unprovable files " +
    "fall into the all-NULL row") {
    val (cat, root) = freshCat("parts")
    mkDayTable(cat)
    val parts = spark.table(s"$cat.`ev$$partitions`")
    assert(parts.schema.fieldNames.toSeq ==
      Seq("ts_day", "region", "file_count", "row_count", "size_bytes"))
    assert(parts.schema("ts_day").dataType ==
      org.apache.spark.sql.types.DateType)
    val fromMeta = parts.select($"ts_day", $"region", $"row_count")
      .as[(java.sql.Date, String, Long)].collect().toSet
    val fromData = spark.table(s"$cat.ev")
      .groupBy(to_date($"ts").as("d"), $"region").count()
      .as[(java.sql.Date, String, Long)].collect().toSet
    assert(fromMeta == fromData)
    // an append containing a NULL ts is unprovable on the days
    // dimension → it aggregates under the all-NULL partition row
    Seq((9999L, null.asInstanceOf[java.sql.Timestamp], "apac"))
      .toDF("k", "ts", "region").coalesce(1)
      .write.mode("append").format("graft-manifest")
      .option("path", s"$root/ev").save()
    val withNull = spark.table(s"$cat.`ev$$partitions`").collect()
    val nullRow = withNull.filter(_.isNullAt(0))
    assert(nullRow.length == 1 && nullRow.head.getLong(3) == 1L)
    assert(withNull.map(_.getLong(3)).sum == 401L, "totals reconcile")
  }

  test("$snapshots: version history with added/removed deltas; " +
    "VERSION AS OF time-travels the metadata itself") {
    val (cat, _) = freshCat("snaps")
    mkDayTable(cat)
    spark.sql(s"DELETE FROM $cat.ev WHERE ts < " +
      "timestamp_seconds(1714521600 + 86400)") // day-aligned: unlists files
    val snaps = spark.table(s"$cat.`ev$$snapshots`")
      .orderBy($"version").collect()
    assert(snaps.length >= 3) // create, append, delete
    assert(snaps.head.getInt(2) == 0, "v1 (CREATE) holds no files")
    val appendV = snaps(1)
    assert(appendV.getInt(4) > 0 && appendV.getInt(5) == 0)
    val deleteV = snaps.last
    assert(deleteV.getInt(5) > 0, "metadata delete removed files")
    assert(deleteV.getLong(3) < appendV.getLong(3))
    assert(snaps.forall(!_.isNullAt(1)), "commit times populated")
    // metadata time travel: $files AS OF the append version still shows
    // the pre-delete file set
    val v = appendV.getInt(0)
    val filesThen = spark.sql(
      s"SELECT count(*) FROM $cat.`ev$$files` VERSION AS OF $v")
      .head().getLong(0)
    val filesNow = spark.table(s"$cat.`ev$$files`").count()
    assert(filesThen > filesNow)
  }

  test("$partitions on an unpartitioned table fails with a pointer; " +
    "metadata names never shadow a real table") {
    val (cat, _) = freshCat("guard")
    spark.sql(s"CREATE TABLE $cat.plain (k BIGINT)")
    spark.range(3).select($"id".as("k")).writeTo(s"$cat.plain").append()
    val e = intercept[Exception] {
      spark.table(s"$cat.`plain$$partitions`").collect()
    }
    assert(e.getMessage.contains("no declared partition layout"),
      e.getMessage)
    // $files and $snapshots work without a layout (partition column null)
    assert(spark.table(s"$cat.`plain$$files`").collect()
      .forall(_.isNullAt(7)))
    assert(spark.table(s"$cat.`plain$$snapshots`").count() >= 2L)
    // with the base table live, its metadata names are RESERVED: a
    // CREATE of the literal name sees the metadata table as existing
    val reserved = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.`plain$$files` (x BIGINT)")
    }
    assert(reserved.getMessage.toLowerCase.contains("already exists"),
      reserved.getMessage)
    // but a REAL table created under the suffix name BEFORE its base
    // exists stays a real table — directory existence wins resolution
    spark.sql(s"CREATE TABLE $cat.`solo$$files` (x BIGINT)")
    spark.range(5).select($"id".as("x")).writeTo(s"$cat.`solo$$files`")
      .append()
    spark.sql(s"CREATE TABLE $cat.solo (k BIGINT)")
    val real = spark.table(s"$cat.`solo$$files`")
    assert(real.schema.fieldNames.toSeq == Seq("x"))
    assert(real.count() == 5L)
  }
}
