package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected `DEDUP TABLE` statement (plans/DedupStatement.scala):
  * parser claims only well-formed DEDUP text, the resolution rule
  * desugars to the window keep-one shape, and every other SQL entry
  * point delegates untouched. */
class DedupStatementSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def seed(): Unit = {
    import spark.implicits._
    Seq((1L, 3, "c"), (1L, 1, "a"), (1L, 2, "b"),
      (2L, 7, "x"), (2L, 5, "y"), (3L, 9, "z"))
      .toDF("k", "v", "tag").createOrReplaceTempView("dedup_in")
  }

  test("KEEP MIN keeps exactly the minimal row per key, full width") {
    seed()
    val got = spark.sql("DEDUP TABLE dedup_in BY (k) KEEP MIN v")
      .orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 1, "a"), (2L, 5, "y"), (3L, 9, "z")))
  }

  test("KEEP MAX keeps the maximal row per key; trailing semicolon is " +
    "tolerated") {
    seed()
    val got = spark.sql("DEDUP TABLE dedup_in BY (k) KEEP MAX v ;")
      .orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 3, "c"), (2L, 7, "x"), (3L, 9, "z")))
  }

  test("INTO writes back: deduped rows land in the target table " +
    "(manifest catalog) as one snapshot commit") {
    import spark.implicits._
    seed()
    val root = java.nio.file.Files.createTempDirectory("graft_dedup_into").toString
    val cat = "graft_dedupcat"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    // target must exist (INTO appends): seed an empty-compatible table
    Seq((0L, 0, "seed")).toDF("k", "v", "tag")
      .write.mode("append").format("graft-manifest")
      .option("path", s"$root/out").save()
    spark.sql(s"DEDUP TABLE dedup_in BY (k) KEEP MAX v INTO $cat.out;")
    val got = spark.table(s"$cat.out").orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((0L, 0, "seed"), (1L, 3, "c"), (2L, 7, "x"), (3L, 9, "z")))
    // the write-back was ONE snapshot commit on top of the seed
    val dir = new org.apache.hadoop.fs.Path(s"$root/out")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(graft.sources.ManifestFiles.latestVersion(fs, dir) == 2)
  }

  test("without KEEP the statement is the distinct BY projection") {
    seed()
    val got = spark.sql("DEDUP TABLE dedup_in BY (k)")
      .orderBy(col("k")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L))
    // multi-column BY
    assert(spark.sql("DEDUP TABLE dedup_in BY (k, tag)").count() == 6)
  }

  test("desugars to the window-rank plan: one shuffle on the BY key, " +
    "no join, no extra aggregation") {
    seed()
    val plan = spark.sql("DEDUP TABLE dedup_in BY (k) KEEP MIN v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(plan.contains("row_number"), plan)
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("everything that is not a DEDUP statement delegates verbatim") {
    seed()
    assert(spark.sql("SELECT count(*) AS n FROM dedup_in").head.getLong(0) == 6)
    // malformed DEDUP falls through to Spark's own syntax error
    val e = intercept[Exception](spark.sql("DEDUP TABLE dedup_in"))
    assert(e.getMessage.toUpperCase.contains("SYNTAX"), e.getMessage)
    // unknown KEEP kind and dangling INTO also delegate verbatim
    val eKind = intercept[Exception](
      spark.sql("DEDUP TABLE dedup_in BY (k) KEEP MEDIAN v"))
    assert(eKind.getMessage.toUpperCase.contains("SYNTAX"), eKind.getMessage)
    val eInto = intercept[Exception](
      spark.sql("DEDUP TABLE dedup_in BY (k) KEEP MIN v INTO"))
    assert(eInto.getMessage.toUpperCase.contains("SYNTAX"), eInto.getMessage)
    // unknown relation fails in analysis, not parsing
    val e2 = intercept[Exception](
      spark.sql("DEDUP TABLE nope_not_here BY (k)").collect())
    assert(e2.getMessage.contains("nope_not_here"), e2.getMessage)
    // unknown KEEP column fails analysis with the column name
    val e3 = intercept[Exception](
      spark.sql("DEDUP TABLE dedup_in BY (k) KEEP MIN missing_col").collect())
    assert(e3.getMessage.contains("missing_col"), e3.getMessage)
  }

  test("named-parameter SQL still works through the delegating parser") {
    seed()
    val n = spark.sql("SELECT count(*) AS n FROM dedup_in WHERE k = :kk",
      Map("kk" -> 1)).head.getLong(0)
    assert(n == 3)
  }
}
