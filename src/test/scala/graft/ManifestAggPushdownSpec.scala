package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** METADATA-ONLY AGGREGATE PUSHDOWN: unfiltered global COUNT/MIN/MAX
  * over a manifest table answer from entry row counts + `#stats`
  * bounds — no data file opens. The headline proof DELETES the data
  * files' bytes from disk and counts anyway; the gates prove the
  * feature can only ever accelerate, never change an answer. */
class ManifestAggPushdownSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def freshCat(tag: String): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_agg_$tag").toString
    val cat = s"graft_agg_${tag}_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def aggPushed(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collectWithSubqueries {
      case b: BatchScanExec => b.scan
    }.exists(_.isInstanceOf[ManifestAggScan])

  test("COUNT(*)/COUNT(col)/MIN/MAX answer from metadata — proven by " +
    "deleting the data files' bytes and aggregating anyway") {
    val (cat, root) = freshCat("core")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT, s STRING)")
    spark.range(0, 10000)
      .select($"id".as("k"),
        when($"id" % 10 === 0, lit(null)).otherwise($"id" * 2).as("v"),
        concat(lit("s"), $"id").as("s"))
      .repartition(4).writeTo(s"$cat.t").append()
    val q = spark.sql(
      s"SELECT count(*) AS n, count(v) AS nv, min(k) AS mn, max(k) AS mx " +
        s"FROM $cat.t")
    assert(aggPushed(q), "global count/min/max must push to metadata:\n" +
      q.queryExecution.executedPlan)
    val r = q.collect()(0)
    assert(r.getLong(0) == 10000 && r.getLong(1) == 9000 &&
      r.getLong(2) == 0L && r.getLong(3) == 9999L, r.toString)
    // the dramatic proof: data bytes GONE, the answer stands
    val dir = new Path(s"$root/t")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(st => fs.delete(st.getPath, false))
    val r2 = spark.sql(s"SELECT count(*) AS n FROM $cat.t").collect()(0)
    assert(r2.getLong(0) == 10000,
      "a metadata-only count must not touch data bytes")
  }

  test("gates: filters, string/float MIN-MAX, delete state, and " +
    "post-evolution columns all fall back to the exact scan path") {
    val (cat, root) = freshCat("gates")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, f DOUBLE, s STRING)")
    spark.range(0, 1000)
      .select($"id".as("k"), ($"id" * 0.5).as("f"),
        concat(lit("a long string payload "), $"id").as("s"))
      .coalesce(1).writeTo(s"$cat.t").append()
    // a filtered aggregate keeps Spark's aggregation (and stays right)
    val filtered = spark.sql(s"SELECT count(*) FROM $cat.t WHERE k < 100")
    assert(!aggPushed(filtered))
    assert(filtered.collect()(0).getLong(0) == 100)
    // string bounds are truncated, float bounds are NaN-hazed: both
    // refuse, both answers still exact through the scan
    val strMin = spark.sql(s"SELECT min(s) FROM $cat.t")
    assert(!aggPushed(strMin))
    assert(strMin.collect()(0).getString(0) == "a long string payload 0")
    val fMax = spark.sql(s"SELECT max(f) FROM $cat.t")
    assert(!aggPushed(fMax))
    assert(fMax.collect()(0).getDouble(0) == 499.5)
    // count(col) on a column some files predate: no #stats slot → refuse
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN extra BIGINT")
    val cNew = spark.sql(s"SELECT count(extra) FROM $cat.t")
    assert(!aggPushed(cNew))
    assert(cNew.collect()(0).getLong(0) == 0)
    // count(*) still pushes — entry rows need no stats
    assert(aggPushed(spark.sql(s"SELECT count(*) FROM $cat.t")))
    // MOR delete state hides rows the entry counts include: refuse
    val (cat2, _) = freshCat("mor")
    spark.sql(s"CREATE TABLE $cat2.t (k BIGINT) " +
      "TBLPROPERTIES('delete.mode'='merge-on-read')")
    spark.range(0, 100).select($"id".as("k")).coalesce(1)
      .writeTo(s"$cat2.t").append()
    spark.sql(s"DELETE FROM $cat2.t WHERE k < 10")
    val cMor = spark.sql(s"SELECT count(*) FROM $cat2.t")
    assert(!aggPushed(cMor))
    assert(cMor.collect()(0).getLong(0) == 90)
    // compaction materializes the deletes — pushdown returns
    spark.sql(s"CALL $cat2.system.compact('t')")
    val cAfter = spark.sql(s"SELECT count(*) FROM $cat2.t")
    assert(aggPushed(cAfter))
    assert(cAfter.collect()(0).getLong(0) == 90)
  }

  test("time travel composes: VERSION AS OF counts the historical " +
    "snapshot from ITS metadata") {
    val (cat, _) = freshCat("tt")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")
    spark.range(0, 500).select($"id".as("k")).writeTo(s"$cat.t").append()
    spark.range(500, 800).select($"id".as("k")).writeTo(s"$cat.t").append()
    val hist = spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 2")
    assert(aggPushed(hist))
    assert(hist.collect()(0).getLong(0) == 500)
    val now = spark.sql(s"SELECT count(*) FROM $cat.t")
    assert(aggPushed(now))
    assert(now.collect()(0).getLong(0) == 800)
  }

  test("decimal and date bounds push exactly; all-null columns answer " +
    "SQL NULL; an empty table counts zero") {
    val (cat, _) = freshCat("types")
    spark.sql(s"CREATE TABLE $cat.t (d DATE, m DECIMAL(12,2), z BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES " +
      "(DATE'2024-03-01', 10.25, NULL), (DATE'2023-01-15', 99.75, NULL)")
    val q = spark.sql(s"SELECT min(d) AS mnd, max(d) AS mxd, " +
      s"min(m) AS mnm, max(m) AS mxm, max(z) AS mz FROM $cat.t")
    assert(aggPushed(q))
    val r = q.collect()(0)
    assert(r.getDate(0).toString == "2023-01-15" &&
      r.getDate(1).toString == "2024-03-01")
    assert(r.getDecimal(2).toString == "10.25" &&
      r.getDecimal(3).toString == "99.75")
    assert(r.isNullAt(4), "an all-null column's MAX is SQL NULL")
    val (cat2, _) = freshCat("empty")
    spark.sql(s"CREATE TABLE $cat2.t (k BIGINT)")
    val c = spark.sql(s"SELECT count(*) FROM $cat2.t")
    assert(c.collect()(0).getLong(0) == 0)
  }
}
