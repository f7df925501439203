package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.sources.ManifestMaterializedView

/** TRANSPARENT MV REWRITING (plans/MvRewrite.scala): a resolved
  * aggregate over a governed source answers from an exactly-fresh MV.
  * Every test asserts BOTH the plan (the optimized plan must scan the
  * MV — or must NOT, for the negative cases) and the values (identical
  * to computing over the source with the rule disabled). */
class MvRewriteSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  private def freshCat(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_mvrw").toString
    val cat = "graft_mvrw_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def seed(cat: String): Unit = {
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.src (k BIGINT, grp STRING, v DOUBLE, " +
      "n BIGINT) TBLPROPERTIES('delete.mode'='merge-on-read')")
    (1L to 300L).map(i => (i, s"g${i % 4}", i * 0.5 + (i % 3) * 0.25, i % 17))
      .toDF("k", "grp", "v", "n").writeTo(s"$cat.src").append()
  }

  /** The MV scan shows up as its identifier in the optimized plan. */
  private def scansMv(df: DataFrame, mv: String): Boolean =
    df.queryExecution.optimizedPlan.toString.contains(s".$mv")

  private def withoutRewrite[T](body: => T): T = {
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try body finally spark.conf.set("spark.graft.mv.rewrite", "true")
  }

  private def assertSame(sql: String, mv: String,
      expectRewrite: Boolean): Unit = {
    val df = spark.sql(sql)
    assert(scansMv(df, mv) == expectRewrite,
      s"expected rewrite=$expectRewrite for: $sql\n" +
        df.queryExecution.optimizedPlan.toString)
    val got = df.collect().map(_.toString).sorted.toSeq
    val want = withoutRewrite {
      val w = spark.sql(sql)
      assert(!scansMv(w, mv), "disable conf must suppress the rewrite")
      w.collect().map(_.toString).sorted.toSeq
    }
    assert(got == want, s"rewritten answer drifted for: $sql")
  }

  test("drift-free aggregates (count/count(e)/min/max/integral-sum) " +
    "rewrite to the MV and answer identically; the conf kills it") {
    val (cat, _) = freshCat()
    seed(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('agg1', 'src', " +
      "'grp', 'count:*:c,count:n:cn,sum:n:sn,min:v:mn,max:v:mx')")
    assertSame(s"SELECT grp, count(*) AS c, sum(n) AS s, min(v) AS mn, " +
      s"max(v) AS mx, count(n) AS cn FROM $cat.src GROUP BY grp",
      "agg1", expectRewrite = true)
  }

  test("staleness gates: a source commit stops the rewrite; refresh " +
    "resumes it; VERSION AS OF the checkpoint still rewrites after " +
    "the source moved on") {
    import spark.implicits._
    val (cat, _) = freshCat()
    seed(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('agg2', 'src', " +
      "'grp', 'count:*:c,max:v:mx')")
    val q = s"SELECT grp, count(*) AS c, max(v) AS mx FROM $cat.src GROUP BY grp"
    assertSame(q, "agg2", expectRewrite = true)
    val ckptVersion = 2 // CREATE TABLE (v1) + seed append (v2)
    Seq((900L, "g1", 450.75, 3L)).toDF("k", "grp", "v", "n")
      .writeTo(s"$cat.src").append() // v3: MV now stale
    assertSame(q, "agg2", expectRewrite = false)
    // a PINNED read at the checkpointed version still answers from the MV
    assertSame(s"SELECT grp, count(*) AS c, max(v) AS mx FROM $cat.src " +
      s"VERSION AS OF $ckptVersion GROUP BY grp", "agg2",
      expectRewrite = true)
    spark.sql(s"CALL $cat.system.refresh_materialized_view('agg2')")
    assertSame(q, "agg2", expectRewrite = true)
  }

  test("filters: exact semantic match rewrites; a key-only filter " +
    "applies as group pruning on a filterless MV; any other filter " +
    "blocks; group-by mismatch blocks") {
    val (cat, _) = freshCat()
    seed(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('agg3', 'src', " +
      "'grp', 'count:*:c', 'v > 10')")
    spark.sql(s"CALL $cat.system.create_materialized_view('agg4', 'src', " +
      "'grp', 'min:v:mn')")
    // exact filter match (modulo analysis casts) → agg3
    assertSame(s"SELECT grp, count(*) AS c FROM $cat.src WHERE v > 10 " +
      "GROUP BY grp", "agg3", expectRewrite = true)
    // key-only filter over the filterless MV → agg4 with a post-filter
    assertSame(s"SELECT grp, min(v) AS mn FROM $cat.src " +
      "WHERE grp IN ('g1', 'g2') GROUP BY grp", "agg4", expectRewrite = true)
    // a non-key filter with no matching MV filter → no rewrite
    assertSame(s"SELECT grp, min(v) AS mn FROM $cat.src WHERE k < 100 " +
      "GROUP BY grp", "agg4", expectRewrite = false)
    // group-by mismatch → no rewrite
    assertSame(s"SELECT grp, k % 2 AS b, count(*) AS c FROM $cat.src " +
      "GROUP BY grp, k % 2", "agg3", expectRewrite = false)
  }

  test("numeric-drift gate: fractional sum and avg rewrite only under " +
    "allowNumericDrift, and the MV's decimal-exact answer matches the " +
    "source recompute on this data") {
    val (cat, _) = freshCat()
    seed(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('agg5', 'src', " +
      "'grp', 'sum:v:sv,avg:v:av')")
    val q = s"SELECT grp, sum(v) AS sv, avg(v) AS av FROM $cat.src GROUP BY grp"
    assert(!scansMv(spark.sql(q), "agg5"),
      "fractional sum/avg must NOT rewrite by default")
    spark.conf.set("spark.graft.mv.rewrite.allowNumericDrift", "true")
    try {
      val df = spark.sql(q)
      assert(scansMv(df, "agg5"))
      val got = df.collect().map(r => (r.getString(0),
        math.round(r.getDouble(1) * 1e9), math.round(r.getDouble(2) * 1e9)))
        .sortBy(_._1).toSeq
      val want = withoutRewrite(spark.sql(q).collect().map(r =>
        (r.getString(0), math.round(r.getDouble(1) * 1e9),
          math.round(r.getDouble(2) * 1e9))).sortBy(_._1).toSeq)
      assert(got == want)
    } finally
      spark.conf.set("spark.graft.mv.rewrite.allowNumericDrift", "false")
  }

  test("a crashed refresh's orphan MV commits never leak: the rewrite " +
    "reads the MV AS OF the checkpointed version") {
    import spark.implicits._
    val (cat, root) = freshCat()
    seed(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('agg6', 'src', " +
      "'grp', 'count:*:c')")
    // land a refresh, then roll its CHECKPOINT back (the crash window):
    // the data commit is ahead of the _MV chain
    Seq((901L, "g2", 7.0, 1L)).toDF("k", "grp", "v", "n")
      .writeTo(s"$cat.src").append()
    spark.sql(s"CALL $cat.system.refresh_materialized_view('agg6')")
    val mvDir = new org.apache.hadoop.fs.Path(root, "agg6")
    val fs = mvDir.getFileSystem(spark.sessionState.newHadoopConf())
    val v = ManifestMaterializedView.versions(fs, mvDir).max
    fs.delete(new org.apache.hadoop.fs.Path(mvDir, s"_MV.v$v"), false)
    // checkpoint says source v2 / mv v2; the orphan commits sit above.
    // A pinned v2 read may rewrite, but must see the PRE-refresh MV rows.
    assertSame(s"SELECT grp, count(*) AS c FROM $cat.src " +
      "VERSION AS OF 2 GROUP BY grp", "agg6", expectRewrite = true)
    // the current head (v3) must NOT rewrite (checkpoint is behind)
    assertSame(s"SELECT grp, count(*) AS c FROM $cat.src GROUP BY grp",
      "agg6", expectRewrite = false)
  }
}
