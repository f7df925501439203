package graft.sources

import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** GOVERNED VIEWS (round 14): definitions live as `_VIEW.v<N>` chains
  * under the catalog root, claimed atomically; GraftManifestCatalog
  * implements Spark 4's `ViewCatalog` interface, and because the 4.1
  * engine ships that interface without a consumer, the SQL surface is
  * `CALL cat.system.create_view/drop_view` + the ResolveGovernedViews
  * rule expanding `SELECT ... FROM cat.v [VERSION AS OF n]`. */
class ManifestViewSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def freshCat(tag: String): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_vw_$tag").toString
    val cat = s"graft_vw_${tag}_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def catalogOf(cat: String): GraftManifestCatalog =
    spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftManifestCatalog]

  test("create, read, EVOLVE (definition versions time-travel), drop") {
    val (cat, _) = freshCat("life")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING)")
    spark.range(0, 30).select($"id".as("k"),
      concat(lit("x"), ($"id" % 3)).as("v")).writeTo(s"$cat.t").append()
    val r = spark.sql(s"CALL $cat.system.create_view('agg', " +
      s"'SELECT v, count(*) AS n FROM $cat.t GROUP BY v')").collect()
    assert(r.head.getString(0) == "agg" && r.head.getInt(1) == 1)
    // reads through BOTH surfaces
    assert(spark.sql(s"SELECT * FROM $cat.agg ORDER BY v").count() == 3L)
    assert(spark.table(s"$cat.agg").columns.toSeq == Seq("v", "n"))
    assert(spark.sql(s"SELECT n FROM $cat.agg WHERE v = 'x0'")
      .head().getLong(0) == 10L)
    // EVOLVE: replace is a new definition version
    val r2 = spark.sql(s"CALL $cat.system.create_view('agg', " +
      s"'SELECT v, CAST(sum(k) AS BIGINT) AS total FROM $cat.t GROUP BY v', " +
      "'true')").collect()
    assert(r2.head.getInt(1) == 2)
    assert(spark.table(s"$cat.agg").columns.toSeq == Seq("v", "total"))
    // the OLD definition still answers under VERSION AS OF
    val v1 = spark.sql(s"SELECT * FROM $cat.agg VERSION AS OF 1 ORDER BY v")
    assert(v1.columns.toSeq == Seq("v", "n"))
    assert(v1.count() == 3L)
    // definition history introspects, newest first (t$snapshots' twin)
    val hist = spark.sql(s"CALL $cat.system.describe_view('agg')").collect()
    assert(hist.map(_.getInt(0)).toSeq == Seq(2, 1))
    assert(hist.head.getString(2).contains("sum(k)"))
    assert(hist.last.getString(2).contains("count(*)"))
    assert(hist.forall(r => !r.isNullAt(1)))
    // the view updates live with its base table (a definition, not a copy)
    spark.range(100, 110).select($"id".as("k"), lit("x0").as("v"))
      .writeTo(s"$cat.t").append()
    assert(spark.sql(s"SELECT total FROM $cat.agg WHERE v = 'x0'")
      .head().getLong(0) > 0L)
    assert(spark.sql(s"SELECT n FROM $cat.agg VERSION AS OF 1 " +
      "WHERE v = 'x0'").head().getLong(0) == 20L)
    // drop: gone from both surfaces, loud on re-drop
    spark.sql(s"CALL $cat.system.drop_view('agg')")
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.agg").collect())
    val e = intercept[Exception](
      spark.sql(s"CALL $cat.system.drop_view('agg')").collect())
    assert(e.getMessage.contains("no view"), e.getMessage)
  }

  test("concurrent CREATE races loudly: exactly one claim lands") {
    val (cat, root) = freshCat("race")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")
    spark.sql(s"CALL $cat.system.create_view('v', " +
      s"'SELECT k FROM $cat.t')")
    // a second CREATE (no replace) must fail — including one racing the
    // claim itself: the rename arbiter admits exactly one _VIEW.v1
    val e = intercept[Exception](spark.sql(
      s"CALL $cat.system.create_view('v', 'SELECT k FROM $cat.t')")
      .collect())
    assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)
    // claim-level: publishing straight at the storage layer against an
    // existing chain with expectFresh refuses too
    val dir = new org.apache.hadoop.fs.Path(root, "v")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val d = ManifestViews.read(fs, dir, None)
    val e2 = intercept[IllegalStateException](
      ManifestViews.publish(fs, dir, d, expectFresh = true))
    assert(e2.getMessage.contains("already exists"))
  }

  test("ViewCatalog API surface: listViews/viewExists/alterView/" +
    "renameView; views and tables exclude each other's names") {
    val (cat, _) = freshCat("api")
    val c = catalogOf(cat)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")
    spark.sql(s"CALL $cat.system.create_view('v1', 'SELECT 1 AS one')")
    spark.sql(s"CALL $cat.system.create_view('v2', 'SELECT 2 AS two')")
    assert(c.listViews().map(_.name).sorted.toSeq == Seq("v1", "v2"))
    // the SQL inventory surface agrees (name + current definition version)
    assert(spark.sql(s"CALL $cat.system.show_views()").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
      == Seq(("v1", 1), ("v2", 1)))
    assert(c.viewExists(Identifier.of(Array.empty, "v1")))
    assert(!c.viewExists(Identifier.of(Array.empty, "t")))
    // tables list excludes views and vice versa
    assert(c.listTables(Array.empty).map(_.name).toSeq == Seq("t"))
    // alterView: property set lands a new definition version
    import org.apache.spark.sql.connector.catalog.ViewChange
    c.alterView(Identifier.of(Array.empty, "v1"),
      ViewChange.setProperty("comment", "governed"))
    assert(c.loadView(Identifier.of(Array.empty, "v1"))
      .properties().get("comment") == "governed")
    // renameView moves the chain
    c.renameView(Identifier.of(Array.empty, "v1"),
      Identifier.of(Array.empty, "v1r"))
    assert(spark.sql(s"SELECT * FROM $cat.v1r").head().getInt(0) == 1)
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.v1").collect())
    // name exclusivity, both directions
    val e1 = intercept[Exception](spark.sql(
      s"CALL $cat.system.create_view('t', 'SELECT 1 AS x')").collect())
    assert(e1.getMessage.contains("is a TABLE"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.v2 (k BIGINT)"))
    assert(e2.getMessage.contains("is a VIEW"), e2.getMessage)
  }

  test("definition bodies are QUERIES with fully-qualified references; " +
    "cycles refuse at replace; nothing ever executes at create") {
    val (cat, _) = freshCat("guard")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")
    spark.range(0, 25).select($"id".as("k")).writeTo(s"$cat.t").append()
    // a DML body is rejected AT THE PARSER — and, crucially, never ran
    intercept[Exception](spark.sql(
      s"CALL $cat.system.create_view('x', 'DELETE FROM $cat.t')").collect())
    assert(spark.table(s"$cat.t").count() == 25L,
      "a rejected DML view body must never execute")
    // a CALL body is rejected too (procedures invoke during ANALYSIS)
    intercept[Exception](spark.sql(
      s"CALL $cat.system.create_view('x', " +
        s"'CALL $cat.system.vacuum(''t'', 1)')").collect())
    // unqualified references are a loud create-time contract — even
    // ones that happen to RESOLVE in the creator's session (a temp
    // view would silently vanish or misresolve for later readers)
    spark.range(3).createOrReplaceTempView("graft_vw_tmp_local")
    val e = intercept[Exception](spark.sql(
      s"CALL $cat.system.create_view('x', " +
        "'SELECT * FROM graft_vw_tmp_local')").collect())
    assert(e.getMessage.contains("fully qualified"), e.getMessage)
    spark.catalog.dropTempView("graft_vw_tmp_local")
    // direct self-reference at replace refuses
    spark.sql(s"CALL $cat.system.create_view('v', " +
      s"'SELECT k FROM $cat.t')")
    val r1 = intercept[Exception](spark.sql(
      s"CALL $cat.system.create_view('v', " +
        s"'SELECT k FROM $cat.v WHERE k > 0', 'true')").collect())
    assert(r1.getMessage.contains("recursive"), r1.getMessage)
    // mutual cycle through another view refuses too
    spark.sql(s"CALL $cat.system.create_view('w', " +
      s"'SELECT k FROM $cat.v')")
    val r2 = intercept[Exception](spark.sql(
      s"CALL $cat.system.create_view('v', " +
        s"'SELECT k FROM $cat.w', 'true')").collect())
    assert(r2.getMessage.contains("recursive"), r2.getMessage)
    // and the surviving definitions still answer
    assert(spark.table(s"$cat.w").count() == 25L)
  }

  test("API-created views keep their column ALIASES; TIMESTAMP AS OF " +
    "on a view refuses loudly") {
    val (cat, _) = freshCat("alias")
    val c = catalogOf(cat)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING)")
    spark.range(0, 5).select($"id".as("k"), lit("s").as("v"))
      .writeTo(s"$cat.t").append()
    val sql = s"SELECT k, v FROM $cat.t"
    val schema = spark.sql(sql).schema
    c.createView(new ViewInfo(Identifier.of(Array.empty, "aliased"), sql,
      cat, Array.empty[String], schema, Array("k", "v"),
      Array("key_out", "val_out"), Array[String](null, null),
      java.util.Collections.emptyMap[String, String]()))
    assert(spark.table(s"$cat.aliased").columns.toSeq
      == Seq("key_out", "val_out"))
    assert(spark.sql(s"SELECT key_out FROM $cat.aliased WHERE val_out = 's'")
      .count() == 5L)
    // TIMESTAMP AS OF has no meaning for a definition chain: it fails
    // loudly (the table-resolution path rejects it before our rule's
    // own refusal can fire — either surface is a clear error)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM $cat.aliased TIMESTAMP AS OF '2020-01-01'").collect())
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(m => m.contains("VERSION AS OF") ||
      m.contains("no snapshot")), chain(e).mkString("|"))
  }

  test("views COMPOSE with the governed format: view-over-view expands " +
    "recursively and table time travel inside a view is honored") {
    val (cat, _) = freshCat("comp")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")
    spark.range(0, 10).select($"id".as("k")).writeTo(s"$cat.t").append() // v2
    spark.range(10, 25).select($"id".as("k")).writeTo(s"$cat.t").append() // v3
    // a view pinning the TABLE's version 2 — table time travel INSIDE
    // the stored SQL
    spark.sql(s"CALL $cat.system.create_view('pinned', " +
      s"'SELECT count(*) AS n FROM $cat.t VERSION AS OF 2')")
    assert(spark.table(s"$cat.pinned").head().getLong(0) == 10L)
    // view over view
    spark.sql(s"CALL $cat.system.create_view('doubled', " +
      s"'SELECT n * 2 AS n2 FROM $cat.pinned')")
    assert(spark.table(s"$cat.doubled").head().getLong(0) == 20L)
    // a broken definition fails at CREATE time, not first read
    val e = intercept[Exception](spark.sql(
      s"CALL $cat.system.create_view('bad', 'SELECT nope FROM $cat.t')")
      .collect())
    assert(e.getMessage.toLowerCase.contains("nope"), e.getMessage)
  }
}
