package graft.plans

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.sources.ManifestMaterializedView

/** SQL DDL for materialized views (plans/MvDdl.scala): CREATE/REFRESH/
  * DROP MATERIALIZED VIEW through the injected parser, decompiling the
  * analyzed SELECT into the same [[ManifestMaterializedView.create]]
  * the procedure surface calls — every test checks the DDL-created MV
  * behaves exactly like a procedure-created one (reads, transparent
  * rewrite, incremental refresh). */
class MvDdlSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def freshCat(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_mvddl").toString
    val cat = "graft_mvddl_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  private def seed(cat: String): Unit = {
    spark.sql(s"CREATE TABLE $cat.src (k BIGINT, grp STRING, v DOUBLE, " +
      "n BIGINT) TBLPROPERTIES('delete.mode'='merge-on-read')")
    (1L to 300L).map(i => (i, s"g${i % 4}", i * 0.5, i % 17))
      .toDF("k", "grp", "v", "n").writeTo(s"$cat.src").append()
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("CREATE MATERIALIZED VIEW … AS SELECT decompiles the analyzed " +
    "aggregate into the MV definition: reads match a direct recompute, " +
    "the transparent rewrite fires, REFRESH/DROP round-trip") {
    val cat = freshCat()
    seed(cat)
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mv1 AS " +
      s"SELECT grp, count(*) AS c, sum(n) AS sn, min(v) AS mn " +
      s"FROM $cat.src WHERE v > 3.0 GROUP BY grp")
    val q = s"SELECT grp, count(*) AS c, sum(n) AS sn, min(v) AS mn " +
      s"FROM $cat.src WHERE v > 3.0 GROUP BY grp"
    assert(spark.sql(q).queryExecution.optimizedPlan.toString.contains(".mv1"),
      "the DDL-created MV must serve the transparent rewrite")
    assert(sortedRows(ManifestMaterializedView.read(spark, cat, "mv1")) ==
      sortedRows {
        spark.conf.set("spark.graft.mv.rewrite", "false")
        try spark.sql(q)
        finally spark.conf.set("spark.graft.mv.rewrite", "true")
      })
    // REFRESH desugars to the procedure: fold an append incrementally
    Seq((400L, "g1", 9.0, 3L)).toDF("k", "grp", "v", "n")
      .writeTo(s"$cat.src").append()
    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.mv1")
    assert(spark.sql(q).queryExecution.optimizedPlan.toString.contains(".mv1"),
      "refresh must re-enable the rewrite at the new head")
    // DROP removes the MV and the rewrite stops
    spark.sql(s"DROP MATERIALIZED VIEW $cat.mv1")
    assert(!spark.sql(q).queryExecution.optimizedPlan.toString.contains(".mv1"))
  }

  test("star definition: JOIN and LEFT JOIN dims in FROM order (first " +
    "table is the fact), filter and dim-keyed GROUP BY decompile; the " +
    "DDL MV equals the procedure-created twin definition-for-definition") {
    val cat = freshCat()
    spark.sql(s"CREATE TABLE $cat.fact (sk BIGINT, f_c BIGINT, amt DOUBLE)")
    spark.sql(s"CREATE TABLE $cat.dimc (c_id BIGINT, c_seg STRING)")
    spark.sql(s"CREATE TABLE $cat.diml (l_id BIGINT, l_name STRING)")
    (0L to 19L).map(i => (i, s"seg${i % 4}")).toDF("c_id", "c_seg")
      .writeTo(s"$cat.dimc").append()
    (0L to 4L).map(i => (i, s"l$i")).toDF("l_id", "l_name")
      .writeTo(s"$cat.diml").append()
    (1L to 200L).map(k => (k, k % 20, k * 0.5))
      .toDF("sk", "f_c", "amt").writeTo(s"$cat.fact").append()
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.smv AS " +
      s"SELECT c_seg, count(*) AS n, sum(sk) AS ssk, " +
      s"count(l_name) AS nl FROM $cat.fact " +
      s"JOIN $cat.dimc ON f_c = c_id " +
      s"LEFT JOIN $cat.diml ON sk % 7 = l_id " +
      s"WHERE amt > 2.0 GROUP BY c_seg")
    // the decompiled definition round-trips through the codec
    val root = spark.conf.get(s"spark.sql.catalog.$cat.root")
    val dir = new org.apache.hadoop.fs.Path(root, "smv")
    val d = ManifestMaterializedView.readDef(
      dir.getFileSystem(spark.sessionState.newHadoopConf()), dir)
    assert(d.source == "fact")
    assert(d.dims.map(x => (x.table, x.kind)) ==
      Seq(("dimc", "inner"), ("diml", "left")))
    assert(d.groupBy == Seq("c_seg"))
    assert(d.aggs.map(_.func) == Seq("count_star", "sum", "count"))
    // and the MV answers the defining query through the rewrite
    val q = s"SELECT c_seg, count(*) AS n, sum(sk) AS ssk, " +
      s"count(l_name) AS nl FROM $cat.fact " +
      s"JOIN $cat.dimc ON f_c = c_id " +
      s"LEFT JOIN $cat.diml ON sk % 7 = l_id " +
      s"WHERE amt > 2.0 GROUP BY c_seg"
    val df = spark.sql(q)
    assert(df.queryExecution.optimizedPlan.toString.contains(".smv"))
    // the admin listing surfaces the MV with its pins and dim kinds
    val shown = spark.sql(s"CALL $cat.system.show_materialized_views()")
      .collect()
    assert(shown.map(_.getString(0)).toSeq == Seq("smv"))
    assert(shown.head.getAs[String]("source") == "fact")
    assert(shown.head.getAs[String]("dims").contains("diml LEFT@v"))
    assert(shown.head.getAs[String]("keys") == "c_seg")
    val want = {
      spark.conf.set("spark.graft.mv.rewrite", "false")
      try sortedRows(spark.sql(q))
      finally spark.conf.set("spark.graft.mv.rewrite", "true")
    }
    assert(sortedRows(df) == want)
  }

  test("OPTIMIZE / VACUUM SQL verbs desugar to the maintenance " +
    "procedures: OPTIMIZE folds files (and, being a marked maintenance " +
    "commit, never un-accelerates an MV), ZORDER BY clusters, WHERE " +
    "scopes, VACUUM drops versions") {
    val cat = freshCat()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, g STRING)")
    (0 until 4).foreach { i =>
      (0L until 50L).map(j => (i * 50L + j, s"g${j % 3}"))
        .toDF("k", "g").coalesce(1).writeTo(s"$cat.t").append()
    }
    val root = spark.conf.get(s"spark.sql.catalog.$cat.root")
    val dir = new org.apache.hadoop.fs.Path(root, "t")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    def files = graft.sources.ManifestFiles.entries(fs, dir, None).length
    assert(files == 4)
    // an MV over the table: OPTIMIZE must not break its rewrite
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.tmv AS " +
      s"SELECT g, count(*) AS c FROM $cat.t GROUP BY g")
    val q = s"SELECT g, count(*) AS c FROM $cat.t GROUP BY g"
    assert(spark.sql(q).queryExecution.optimizedPlan.toString.contains(".tmv"))
    spark.sql(s"OPTIMIZE $cat.t INTO 2 FILES")
    assert(files == 2, "OPTIMIZE must fold to the requested file count")
    assert(spark.sql(q).queryExecution.optimizedPlan.toString.contains(".tmv"),
      "OPTIMIZE is a marked maintenance commit — the MV must keep serving")
    // ZORDER BY re-clusters (multi-column sort_by path)
    spark.sql(s"OPTIMIZE $cat.t ZORDER BY (g, k) INTO 3 FILES")
    assert(files == 3)
    // scoped form: WHERE folds only stats-proven files; out-of-scope
    // rows are untouched and the table stays exact
    val before = spark.table(s"$cat.t").collect().map(_.toString).sorted.toSeq
    spark.sql(s"OPTIMIZE $cat.t WHERE k < 0")
    assert(spark.table(s"$cat.t").collect().map(_.toString).sorted.toSeq
      == before)
    // VACUUM RETAIN drops old versions (tags pin — none here)
    val versionsBefore =
      graft.sources.ManifestFiles.versions(fs, dir).length
    assert(versionsBefore > 1)
    spark.sql(s"VACUUM $cat.t RETAIN 1 VERSIONS")
    assert(graft.sources.ManifestFiles.versions(fs, dir).length == 1)
  }

  test("refusals carry the reason: DISTINCT aggregates, expression " +
    "group keys, ORDER BY, unsupported aggregates, foreign tables; " +
    "non-MV SQL is untouched") {
    val cat = freshCat()
    seed(cat)
    def rejects(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    rejects(s"CREATE MATERIALIZED VIEW $cat.bad AS SELECT grp, " +
      s"count(DISTINCT n) AS d FROM $cat.src GROUP BY grp", "DISTINCT")
    rejects(s"CREATE MATERIALIZED VIEW $cat.bad AS SELECT grp || 'x' " +
      s"AS g2, count(*) AS c FROM $cat.src GROUP BY grp || 'x'",
      "bare column")
    rejects(s"CREATE MATERIALIZED VIEW $cat.bad AS SELECT grp, " +
      s"count(*) AS c FROM $cat.src GROUP BY grp ORDER BY grp",
      "plain GROUP BY aggregate")
    rejects(s"CREATE MATERIALIZED VIEW $cat.bad AS SELECT grp, " +
      s"stddev(v) AS s FROM $cat.src GROUP BY grp",
      "outside the incremental algebra")
    // STABILITY GATE (round-16 self-review): refreshes re-evaluate the
    // definition, so time-dependent or random expressions refuse — via
    // BOTH front doors (the gate lives in create itself)
    rejects(s"CREATE MATERIALIZED VIEW $cat.bad AS SELECT grp, " +
      s"count(*) AS c FROM $cat.src " +
      "WHERE v > rand() GROUP BY grp", "non-deterministic")
    rejects(s"CREATE MATERIALIZED VIEW $cat.bad AS SELECT grp, " +
      s"sum(k + unix_timestamp(current_timestamp())) AS s " +
      s"FROM $cat.src GROUP BY grp", "evaluation time")
    rejects(s"CALL $cat.system.create_materialized_view('bad', 'src', " +
      "'grp', 'count:*:c', 'v > rand()')", "non-deterministic")
    // an ALIASED group key would silently change the declared schema
    rejects(s"CREATE MATERIALIZED VIEW $cat.bad AS SELECT grp AS g, " +
      s"count(*) AS c FROM $cat.src GROUP BY grp", "aliased")
    // a plain SELECT with the words in a string literal is not claimed
    assert(spark.sql("SELECT 'CREATE MATERIALIZED VIEW x' AS s")
      .head().getString(0).nonEmpty)
    // Spark's own CREATE VIEW still parses through the delegate
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW plainview AS SELECT 1 AS one")
    assert(spark.sql("SELECT one FROM plainview").head().getInt(0) == 1)
  }
}
