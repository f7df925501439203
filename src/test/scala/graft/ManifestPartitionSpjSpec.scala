package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Storage-partitioned joins on the TIME dimension (round 12): a
  * days()/months()/identity-partitioned manifest table plans one
  * `HasPartitionKey` split per partition value and reports
  * `KeyGroupedPartitioning(days(col))` (the transform resolving through
  * the catalog's V2 `days`/`months` functions — the same math the
  * partition-splitting writer keys files by), so two day-laid tables
  * join, and one aggregates by its partition column, with ZERO
  * exchanges. Group keys derive from each file's stats (null-free,
  * min/max in one group — value-purity the writer guarantees); any
  * foreign file degrades the layout to a normal scan, never a wrong
  * one. Gated on `spark.sql.sources.v2.bucketing.enabled` like
  * Iceberg's preserve-data-grouping. */
class ManifestPartitionSpjSpec extends AnyFunSuite {

  lazy val spark = {
    val s = GraftSession.local(4)
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s
  }
  import spark.implicits._

  private def freshCat(tag: String): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_pspj_$tag").toString
    val cat = s"graft_pspj_${tag}_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    def count(p: SparkPlan): Int =
      p.collectWithSubqueries {
        case _: ShuffleExchangeLike => 1
        case q: QueryStageExec => count(q.plan)
      }.sum
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      case p => count(p)
    }
  }

  private def noBroadcast[A](body: => A): A = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", (32L << 20).toString)
  }

  test("two identity(date)-partitioned tables join on the date with " +
    "zero shuffles; a partition-column aggregate needs none either") {
    val (cat, _) = freshCat("id")
    spark.sql(s"CREATE TABLE $cat.fact (k BIGINT, d DATE, v DOUBLE) " +
      "PARTITIONED BY (d)")
    spark.sql(s"CREATE TABLE $cat.dim (d DATE, name STRING) " +
      "PARTITIONED BY (d)")
    val base = java.sql.Date.valueOf("2024-05-01")
    spark.range(0, 240).select($"id".as("k"),
        date_add(lit(base), ($"id" % 6).cast("int")).as("d"),
        ($"id" % 9).cast("double").as("v"))
      .repartition(5).writeTo(s"$cat.fact").append()
    spark.range(0, 6).select(date_add(lit(base), $"id".cast("int")).as("d"),
        concat(lit("day-"), $"id").as("name"))
      .repartition(3).writeTo(s"$cat.dim").append()
    noBroadcast {
      // no ORDER BY inside the asserted query — a global sort would add
      // its own (legitimate) range exchange
      val q = spark.sql(s"""
        SELECT f.d, any_value(m.name) AS name, COUNT(*) AS n, SUM(f.v) AS s
        FROM $cat.fact f JOIN $cat.dim m ON f.d = m.d
        GROUP BY f.d""")
      assert(shuffles(q) == 0,
        s"expected SPJ + grouped agg, plan:\n${q.queryExecution.executedPlan}")
      val rows = q.collect().sortBy(_.getDate(0).toString)
      assert(rows.length == 6)
      assert(rows.map(_.getLong(2)).sum == 240L)
      // answers match the forced-shuffle baseline
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      try {
        val base2 = spark.sql(s"""
          SELECT f.d, any_value(m.name) AS name, COUNT(*) AS n, SUM(f.v) AS s
          FROM $cat.fact f JOIN $cat.dim m ON f.d = m.d
          GROUP BY f.d""")
        assert(shuffles(base2) > 0)
        assert(base2.collect().sortBy(_.getDate(0).toString).toSeq
          == rows.toSeq)
      } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    }
  }

  test("two days(ts)-partitioned tables storage-partition-join on ts") {
    val (cat, _) = freshCat("days")
    spark.sql(s"CREATE TABLE $cat.a (ts TIMESTAMP, v BIGINT) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"CREATE TABLE $cat.b (ts TIMESTAMP, w BIGINT) " +
      "PARTITIONED BY (days(ts))")
    def rows(col: String) =
      spark.range(0, 240).select(
        (lit(1714521600L) + $"id" * 3600).cast("timestamp").as("ts"),
        ($"id" % 11).as(col))
    rows("v").repartition(5).writeTo(s"$cat.a").append()
    rows("w").repartition(4).writeTo(s"$cat.b").append()
    noBroadcast {
      val q = spark.sql(s"""
        SELECT a.ts, a.v, b.w FROM $cat.a a JOIN $cat.b b ON a.ts = b.ts""")
      assert(shuffles(q) == 0,
        s"expected days-SPJ, plan:\n${q.queryExecution.executedPlan}")
      val got = q.collect()
      assert(got.length == 240)
      assert(got.forall(r => r.getLong(1) == r.getLong(2)))
    }
  }

  test("mismatched partition value sets still join exchange-free " +
    "(missing days on one side)") {
    val (cat, _) = freshCat("mis")
    spark.sql(s"CREATE TABLE $cat.a (ts TIMESTAMP, v BIGINT) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"CREATE TABLE $cat.b (ts TIMESTAMP, w BIGINT) " +
      "PARTITIONED BY (days(ts))")
    spark.range(0, 240).select(
        (lit(1714521600L) + $"id" * 3600).cast("timestamp").as("ts"),
        $"id".as("v"))
      .repartition(5).writeTo(s"$cat.a").append()
    // b covers only the first 5 of a's 10 days
    spark.range(0, 120).select(
        (lit(1714521600L) + $"id" * 3600).cast("timestamp").as("ts"),
        $"id".as("w"))
      .repartition(4).writeTo(s"$cat.b").append()
    noBroadcast {
      val q = spark.sql(
        s"SELECT a.ts, a.v, b.w FROM $cat.a a JOIN $cat.b b ON a.ts = b.ts")
      assert(shuffles(q) == 0,
        s"plan:\n${q.queryExecution.executedPlan}")
      assert(q.collect().length == 120)
    }
  }

  test("composite layout (days(ts), region) joins on BOTH keys with " +
    "zero shuffles; dropping one join key falls back to a shuffle") {
    val (cat, _) = freshCat("comp")
    spark.sql(s"CREATE TABLE $cat.a (ts TIMESTAMP, region STRING, v BIGINT) " +
      "PARTITIONED BY (days(ts), region)")
    spark.sql(s"CREATE TABLE $cat.b (ts TIMESTAMP, region STRING, w BIGINT) " +
      "PARTITIONED BY (days(ts), region)")
    def rows(col: String) =
      spark.range(0, 240).select(
        (lit(1714521600L) + ($"id" % 4) * 86400L).cast("timestamp").as("ts"),
        element_at(array(lit("apac"), lit("emea")),
          (($"id" / 4) % 2 + 1).cast("int")).as("region"),
        $"id".as(col))
    rows("v").repartition(5).writeTo(s"$cat.a").append()
    rows("w").repartition(3).writeTo(s"$cat.b").append()
    noBroadcast {
      val q = spark.sql(s"""
        SELECT a.ts, a.region, count(*) AS n FROM $cat.a a
        JOIN $cat.b b ON a.ts = b.ts AND a.region = b.region
        GROUP BY a.ts, a.region""")
      assert(shuffles(q) == 0,
        s"expected composite SPJ, plan:\n${q.queryExecution.executedPlan}")
      val got = q.collect()
      // 8 (day, region) groups of 30×30 pairs each — ts is day-constant
      // per id%4 so each (ts, region) cell holds 30 rows a side
      assert(got.length == 8)
      assert(got.map(_.getLong(2)).sum == 8 * 30L * 30L)
      // joining on ts alone cannot use the (days, region) grouping —
      // region would be co-partitioned on an absent key — so the plan
      // legitimately shuffles and the answer is still exact
      val q2 = spark.sql(
        s"SELECT count(*) AS n FROM $cat.a a JOIN $cat.b b ON a.ts = b.ts")
      assert(q2.head().getLong(0) == 4L * 60 * 60)
    }
  }

  test("a foreign (non-day-pure) append degrades the layout to a normal " +
    "scan, never a wrong one") {
    val (cat, root) = freshCat("deg")
    spark.sql(s"CREATE TABLE $cat.t (ts TIMESTAMP, v BIGINT) " +
      "PARTITIONED BY (days(ts))")
    spark.range(0, 96).select(
        (lit(1714521600L) + $"id" * 3600).cast("timestamp").as("ts"),
        $"id".as("v"))
      .repartition(3).writeTo(s"$cat.t").append()
    // a hand-rolled multi-day file (bypasses the table's write path by
    // writing path-based with a DIFFERENT session conf off — simplest:
    // a one-file coalesced append spans all days only if the splitter
    // were absent, so instead fake purity loss via a NULL ts row)
    Seq((null.asInstanceOf[java.sql.Timestamp], 999L)).toDF("ts", "v")
      .coalesce(1).write.mode("append").format("graft-manifest")
      .option("path", s"$root/t").save()
    noBroadcast {
      val q = spark.sql(
        s"SELECT a.ts, a.v, b.v FROM $cat.t a JOIN $cat.t b ON a.ts = b.ts")
      // layout gone (the null-ts file has no null-free proof) — plan
      // shuffles, but the answer is exact (null never joins)
      assert(q.collect().length == 96)
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE ts IS NULL")
      .head().getLong(0) == 1L)
  }
}
