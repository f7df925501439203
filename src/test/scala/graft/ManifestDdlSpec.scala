package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** DDL-first manifest tables: `CREATE TABLE cat.t (…) PARTITIONED BY
  * (bucket(n, col))` publishes an empty snapshot whose `#tableconf` line
  * makes every later `INSERT INTO` auto-cluster into the SPJ layout —
  * the SQL-only user gets bucketed joins without ever passing writer
  * options. CTAS and INSERT OVERWRITE keep the declared layout.
  */
class ManifestDdlSpec extends AnyFunSuite {

  lazy val spark = {
    val s = GraftSession.local(4)
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s
  }

  private def freshCat(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_ddl").toString
    val cat = "graft_ddl_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
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

  test("CREATE TABLE PARTITIONED BY bucket + INSERT INTO auto-clusters; " +
    "the pure-SQL self-join plans zero shuffles") {
    val cat = freshCat()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    assert(spark.sql(s"SELECT * FROM $cat.t").count() == 0) // empty table reads
    spark.sql(s"INSERT INTO $cat.t " +
      "SELECT id AS k, md5(CAST(id AS STRING)) AS v FROM range(2000)")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = spark.sql(s"SELECT a.k, COUNT(*) AS n " +
        s"FROM $cat.t a JOIN $cat.t b ON a.k = b.k GROUP BY a.k")
      assert(shuffles(q) == 0,
        s"DDL-declared layout should SPJ:\n${q.queryExecution.executedPlan}")
      assert(q.collect().length == 2000)
    } finally spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", (32L << 20).toString)
  }

  test("INSERT OVERWRITE keeps the declared layout (conf line survives " +
    "truncate); appends after it still cluster") {
    val cat = freshCat()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id % 7 FROM range(100)")
    spark.sql(s"INSERT OVERWRITE $cat.t SELECT id, id % 5 FROM range(500)")
    spark.sql(s"INSERT INTO $cat.t SELECT id + 500, id % 5 FROM range(100)")
    // all live files still carry bucket ids → layout intact
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = spark.sql(s"SELECT a.k, COUNT(*) AS n " +
        s"FROM $cat.t a JOIN $cat.t b ON a.k = b.k GROUP BY a.k")
      assert(shuffles(q) == 0,
        s"layout must survive INSERT OVERWRITE:\n${q.queryExecution.executedPlan}")
      assert(q.collect().length == 600)
    } finally spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", (32L << 20).toString)
  }

  test("CTAS with a bucket transform lays out the select result clustered") {
    val cat = freshCat()
    spark.sql(s"CREATE TABLE $cat.c PARTITIONED BY (bucket(4, k)) AS " +
      "SELECT id AS k, id % 3 AS m FROM range(1000)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.c").collect()(0).getLong(0) == 1000)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = spark.sql(s"SELECT a.k, COUNT(*) AS n " +
        s"FROM $cat.c a JOIN $cat.c b ON a.k = b.k GROUP BY a.k")
      assert(shuffles(q) == 0,
        s"CTAS should produce the clustered layout:\n${q.queryExecution.executedPlan}")
    } finally spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", (32L << 20).toString)
  }

  test("compact folds files WITHIN a DDL-declared layout: the conf line " +
    "and clustering survive, sort_by is rejected") {
    val cat = freshCat()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id % 7 FROM range(400)")
    spark.sql(s"INSERT INTO $cat.t SELECT id + 400, id % 7 FROM range(400)")
    val err = intercept[Exception] {
      spark.sql(s"CALL $cat.system.compact('t', 2, 'v')").collect()
    }
    assert(err.getMessage.contains("bucket layout"), err.getMessage)
    val res = spark.sql(s"CALL $cat.system.compact('t', 2)").collect()(0)
    assert(res.getInt(2) == 4, s"compacted to the bucket count, got $res")
    // layout survived the rewrite: INSERT still clusters, join still SPJ
    spark.sql(s"INSERT INTO $cat.t SELECT id + 800, id % 7 FROM range(100)")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = spark.sql(s"SELECT a.k, COUNT(*) AS n " +
        s"FROM $cat.t a JOIN $cat.t b ON a.k = b.k GROUP BY a.k")
      assert(shuffles(q) == 0,
        s"layout must survive compact:\n${q.queryExecution.executedPlan}")
      assert(q.collect().length == 900)
    } finally spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", (32L << 20).toString)
  }

  test("unsupported DDL shapes fail loudly; duplicate CREATE fails; " +
    "plain CREATE TABLE without partitioning works") {
    val cat = freshCat()
    spark.sql(s"CREATE TABLE $cat.plain (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.plain VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql(s"SELECT * FROM $cat.plain").count() == 2)
    val dup = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.plain (k BIGINT)")
    }
    assert(dup.getMessage.toLowerCase.contains("already exists"))
    // identity/days/months (r12) + years/hours/truncate (r13) are
    // supported layouts; an unimplemented transform still fails loudly
    // with the full menu
    val unsupported = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.badpart (k BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (weeks(ts))")
    }
    assert(unsupported.getMessage.contains("PARTITIONED BY"),
      unsupported.getMessage)
  }
}
