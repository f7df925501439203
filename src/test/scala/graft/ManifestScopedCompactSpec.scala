package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** SCOPED compaction (round 12 — Iceberg's rewrite_data_files with a
  * filter): `CALL compact(t, target, sort_by, where)` folds ONLY the
  * files whose stats PROVE every row satisfies `where`; partially
  * covered files stay byte-identical, the replacement is one atomic
  * commit, and a declared partition layout survives the rewrite. At
  * 100 TB this is the only compact that exists — you fold yesterday's
  * small files, never the table. */
class ManifestScopedCompactSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def freshCat(tag: String): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_sc_$tag").toString
    val cat = s"graft_sc_${tag}_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def files(root: String): Set[String] =
    new java.io.File(root).listFiles().map(_.getName)
      .filter(_.startsWith("part-")).toSet

  test("fold yesterday only: scoped files merge, today's files stay " +
    "byte-identical, the layout survives, answers unchanged") {
    val (cat, root) = freshCat("day")
    spark.sql(s"CREATE TABLE $cat.ev (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    // 3 appends × 2 days = ~6 files (2 per day per append)
    def ins(lo: Int, hi: Int) = spark.range(lo, hi).select($"id".as("k"),
        (lit(1714521600L) + ($"id" % 2) * 86400L + $"id").cast("timestamp")
          .as("ts"))
      .writeTo(s"$cat.ev").append()
    ins(0, 100); ins(100, 200); ins(200, 300)
    val beforeFiles = files(s"$root/ev")
    val expected = spark.table(s"$cat.ev").orderBy($"k").collect().toSeq
    // fold day 0 only
    val res = spark.sql(s"CALL $cat.system.compact('ev', 1, '', " +
      "'ts < timestamp_seconds(1714521600 + 86400)')").collect()
    assert(res.head.getInt(1) > res.head.getInt(2),
      s"files ${res.head.getInt(1)} -> ${res.head.getInt(2)}")
    val afterFiles = files(s"$root/ev")
    // today's files untouched; yesterday's replaced by fewer
    val day1Files = beforeFiles & afterFiles
    assert(day1Files.nonEmpty, "unscoped files must survive untouched")
    assert((afterFiles -- beforeFiles).nonEmpty, "folded files are new")
    // folded files are still day-pure (the layout rides the rewrite)
    val spans = spark.read.format("graft-manifest")
      .option("path", s"$root/ev").load()
      .groupBy($"_file").agg(countDistinct(to_date($"ts")).as("n")).collect()
    spans.foreach(r => assert(r.getLong(1) == 1L,
      s"file ${r.get(0)} mixes days after scoped compact"))
    assert(spark.table(s"$cat.ev").orderBy($"k").collect().toSeq == expected)
    // retention delete on the folded day is STILL metadata-only
    val pre = files(s"$root/ev")
    spark.sql(s"DELETE FROM $cat.ev WHERE ts < " +
      "timestamp_seconds(1714521600 + 86400)")
    assert(files(s"$root/ev") == pre)
    assert(spark.table(s"$cat.ev").count() == 150L)
  }

  test("selection is stats-sound: a partially covered file is never " +
    "rewritten; empty scope is a no-op") {
    val (cat, root) = freshCat("sound")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v DOUBLE)")
    def slice(lo: Int, hi: Int) =
      spark.range(lo, hi).select($"id".as("k"), lit(1.0).as("v"))
        .coalesce(1).writeTo(s"$cat.t").append()
    slice(0, 50); slice(50, 100); slice(100, 200)
    // LIVE manifest entries (the directory keeps replaced files for
    // time travel until vacuum — disk listings cannot distinguish)
    def entries(): Set[String] = spark.read.format("graft-manifest")
      .option("path", s"$root/t").load()
      .select($"_file").distinct().as[String].collect().toSet
    val before = entries()
    assert(before.size == 3)
    // k < 120 fully covers [0,50) and [50,100) but only PART of
    // [100,200) — two files fold, the third stays byte-identical
    val res = spark.sql(
      s"CALL $cat.system.compact('t', 1, '', 'k < 120')").collect()
    assert(res.head.getInt(1) == 3 && res.head.getInt(2) == 2, res.head)
    val after = entries()
    assert((before & after).size == 1, "the partial file must survive")
    assert(spark.table(s"$cat.t").count() == 200L)
    // scope matching nothing: no-op, no new version
    val v0 = spark.sql(s"CALL $cat.system.snapshots('t')")
      .agg(max($"version")).head().getInt(0)
    val noop = spark.sql(
      s"CALL $cat.system.compact('t', 1, '', 'k > 100000')").collect()
    assert(noop.head.getInt(1) == noop.head.getInt(2))
    assert(spark.sql(s"CALL $cat.system.snapshots('t')")
      .agg(max($"version")).head().getInt(0) == v0, "no-op publishes nothing")
  }

  test("guards: pending delete vectors, bucket layouts, and " +
    "untranslatable predicates refuse loudly") {
    val (cat, _) = freshCat("guard")
    spark.sql(s"CREATE TABLE $cat.m (k BIGINT) " +
      "TBLPROPERTIES('delete.mode'='merge-on-read')")
    spark.range(0, 50).select($"id".as("k")).writeTo(s"$cat.m").append()
    spark.sql(s"DELETE FROM $cat.m WHERE k = 3")
    val mor = intercept[Exception] {
      spark.sql(s"CALL $cat.system.compact('m', 1, '', 'k < 10')").collect()
    }
    assert(mor.getMessage.contains("delete vectors"), mor.getMessage)
    spark.sql(s"CREATE TABLE $cat.b (k BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.range(0, 50).select($"id".as("k")).writeTo(s"$cat.b").append()
    val bkt = intercept[Exception] {
      spark.sql(s"CALL $cat.system.compact('b', 1, '', 'k < 10')").collect()
    }
    assert(bkt.getMessage.contains("bucket"), bkt.getMessage)
    spark.sql(s"CREATE TABLE $cat.p (k BIGINT)")
    spark.range(0, 10).select($"id".as("k")).writeTo(s"$cat.p").append()
    val untrans = intercept[Exception] {
      spark.sql(s"CALL $cat.system.compact('p', 1, '', 'k % 2 = 0')").collect()
    }
    assert(untrans.getMessage.contains("pushable"), untrans.getMessage)
  }
}
