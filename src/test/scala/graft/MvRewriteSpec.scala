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

  // ---- STAR-JOIN rewriting + staleness compensation (round 15) --------

  private def seedStar(cat: String): Unit = {
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.fact (sk BIGINT, f_c BIGINT, " +
      "f_i BIGINT, amt DOUBLE, qty BIGINT) " +
      "TBLPROPERTIES('delete.mode'='merge-on-read')")
    spark.sql(s"CREATE TABLE $cat.dimc (c_id BIGINT, c_seg STRING)")
    spark.sql(s"CREATE TABLE $cat.dimi (i_id BIGINT, i_cat STRING)")
    (0L to 19L).map(i => (i, s"seg${i % 4}")).toDF("c_id", "c_seg")
      .writeTo(s"$cat.dimc").append()
    (0L to 9L).map(i => (i, s"cat${i % 3}")).toDF("i_id", "i_cat")
      .writeTo(s"$cat.dimi").append()
    (1L to 300L).map(k => (k, k % 20, k % 10, k * 0.5, k % 7))
      .toDF("sk", "f_c", "f_i", "amt", "qty").writeTo(s"$cat.fact").append()
  }

  test("STAR-JOIN rewrite: an aggregate over fact ⋈ dims answers from " +
    "the join MV when keys, join-condition SET, filter, and every pin " +
    "line up — reordered joins and flipped equality operands included; " +
    "a different ON condition, an outer join, or a time-traveled dim " +
    "kill it") {
    val (cat, _) = freshCat()
    seedStar(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('starmv', " +
      "'fact', 'c_seg,i_cat', " +
      "'count:*:n,sum:qty:sq,min:amt:mn,max:amt:mx', '', " +
      "'dimc ON f_c = c_id,dimi ON f_i = i_id')")
    val sel = "count(*) AS n, sum(qty) AS sq, min(amt) AS mn, max(amt) AS mx"
    assertSame(s"SELECT c_seg, i_cat, $sel FROM $cat.fact " +
      s"JOIN $cat.dimc ON f_c = c_id JOIN $cat.dimi ON f_i = i_id " +
      "GROUP BY c_seg, i_cat", "starmv", expectRewrite = true)
    // join order permuted + equality operands flipped: same condition SET
    assertSame(s"SELECT c_seg, i_cat, $sel FROM $cat.dimi " +
      s"JOIN $cat.fact ON i_id = f_i JOIN $cat.dimc ON c_id = f_c " +
      "GROUP BY c_seg, i_cat", "starmv", expectRewrite = true)
    // a DIFFERENT join condition is a different query — never rewrite
    assertSame(s"SELECT c_seg, i_cat, $sel FROM $cat.fact " +
      s"JOIN $cat.dimc ON f_c = c_id JOIN $cat.dimi ON f_c = i_id " +
      "GROUP BY c_seg, i_cat", "starmv", expectRewrite = false)
    // outer joins change semantics — never rewrite
    assertSame(s"SELECT c_seg, i_cat, $sel FROM $cat.fact " +
      s"LEFT JOIN $cat.dimc ON f_c = c_id JOIN $cat.dimi ON f_i = i_id " +
      "GROUP BY c_seg, i_cat", "starmv", expectRewrite = false)
    // a dim read at a non-pinned version — never rewrite
    assertSame(s"SELECT c_seg, i_cat, $sel FROM $cat.fact " +
      s"JOIN $cat.dimc VERSION AS OF 1 ON f_c = c_id " +
      s"JOIN $cat.dimi ON f_i = i_id " +
      "GROUP BY c_seg, i_cat", "starmv", expectRewrite = false)
    // a key-only filter on the filterless MV prunes groups instead
    assertSame(s"SELECT c_seg, i_cat, $sel FROM $cat.fact " +
      s"JOIN $cat.dimc ON f_c = c_id JOIN $cat.dimi ON f_i = i_id " +
      "WHERE c_seg = 'seg1' GROUP BY c_seg, i_cat", "starmv",
      expectRewrite = true)
  }

  /** Stale-compensation plan probe: the PHYSICAL plan must read BOTH
    * the MV storage (by path — the name rides the scan description) and
    * the fact's change feed. */
  private def compensated(df: DataFrame, mv: String): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    p.contains(mv) && p.contains("graft-manifest-changefeed")
  }

  private def withStale[T](body: => T): T = {
    spark.conf.set("spark.graft.mv.rewrite.allowStale", "true")
    try body
    finally spark.conf.set("spark.graft.mv.rewrite.allowStale", "false")
  }

  test("STALE-TOLERANT rewrite (delta compensation): commits past the " +
    "checkpoint no longer kill the rewrite under allowStale — the plan " +
    "answers MV ⊎ fold(CDF tail) and matches the direct plan exactly; " +
    "min/max ride only an append-only tail; off by default") {
    import spark.implicits._
    val (cat, _) = freshCat()
    seed(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('agg7', 'src', " +
      "'grp', 'count:*:c,sum:n:sn,min:v:mn,max:v:mx')")
    // two commits past the checkpoint: an append and another append
    Seq((901L, "g1", 9999.5, 40L), (902L, "g9", 1.0, 2L))
      .toDF("k", "grp", "v", "n").writeTo(s"$cat.src").append()
    Seq((903L, "g2", -7.0, 3L)).toDF("k", "grp", "v", "n")
      .writeTo(s"$cat.src").append()
    val q = s"SELECT grp, count(*) AS c, sum(n) AS sn, min(v) AS mn, " +
      s"max(v) AS mx FROM $cat.src GROUP BY grp"
    // default: staleness still refuses
    assert(!compensated(spark.sql(q), "agg7") && !scansMv(spark.sql(q), "agg7"))
    withStale {
      val df = spark.sql(q)
      assert(compensated(df, "agg7"),
        "stale rewrite must read the MV + the change-feed tail:\n" +
          df.queryExecution.optimizedPlan.toString)
      val got = df.collect().map(_.toString).sorted.toSeq
      val want = withoutRewrite(spark.sql(q).collect()
        .map(_.toString).sorted.toSeq)
      assert(got == want, "compensated answer drifted from direct")
      // new group g9 appears, injected purely from the tail
      assert(df.collect().exists(_.getString(0) == "g9"))
    }
    // a DELETE lands in the tail: extrema can no longer compensate
    spark.sql(s"DELETE FROM $cat.src WHERE k = 901")
    withStale {
      assert(!compensated(spark.sql(q), "agg7") &&
        !scansMv(spark.sql(q), "agg7"),
        "min/max must refuse a tail with retractions")
      val qCnt = s"SELECT grp, count(*) AS c, sum(n) AS sn FROM $cat.src " +
        "GROUP BY grp"
      val df = spark.sql(qCnt)
      assert(compensated(df, "agg7"),
        "count/sum fold signed legs — deletes in the tail are fine:\n" +
          df.queryExecution.optimizedPlan.toString)
      val got = df.collect().map(_.toString).sorted.toSeq
      val want = withoutRewrite(spark.sql(qCnt).collect()
        .map(_.toString).sorted.toSeq)
      assert(got == want)
      // g9's lone row survived; g1 lost one row vs the MV state
      assert(df.collect().exists(_.getString(0) == "g9"))
    }
    // refresh catches the MV up: the plain exact rewrite returns
    spark.sql(s"CALL $cat.system.refresh_materialized_view('agg7')")
    assertSame(q, "agg7", expectRewrite = true)
  }

  test("STALE compensation composes with STAR joins: the tail folds " +
    "through the pinned dims; a moved dim still kills the rewrite") {
    import spark.implicits._
    val (cat, _) = freshCat()
    seedStar(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('starc', " +
      "'fact', 'c_seg', 'count:*:n,sum:qty:sq', '', " +
      "'dimc ON f_c = c_id')")
    Seq((400L, 3L, 1L, 50.0, 9L), (401L, 8L, 2L, 60.0, 4L))
      .toDF("sk", "f_c", "f_i", "amt", "qty").writeTo(s"$cat.fact").append()
    val q = s"SELECT c_seg, count(*) AS n, sum(qty) AS sq FROM $cat.fact " +
      s"JOIN $cat.dimc ON f_c = c_id GROUP BY c_seg"
    withStale {
      val df = spark.sql(q)
      assert(compensated(df, "starc"),
        df.queryExecution.optimizedPlan.toString)
      val got = df.collect().map(_.toString).sorted.toSeq
      val want = withoutRewrite(spark.sql(q).collect()
        .map(_.toString).sorted.toSeq)
      assert(got == want)
      // dim moves: pinned-dim compensation is no longer the query
      Seq((20L, "seg7")).toDF("c_id", "c_seg").writeTo(s"$cat.dimc").append()
      assert(!compensated(spark.sql(q), "starc") &&
        !scansMv(spark.sql(q), "starc"),
        "a dim past its pin must kill the rewrite entirely")
    }
  }

  test("drop_materialized_view removes the materialization, its " +
    "checkpoint chain, and the registry marker — the rewrite stops and " +
    "direct answers continue; a plain table refuses the procedure") {
    val (cat, root) = freshCat()
    seed(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('agg9', 'src', " +
      "'grp', 'count:*:c')")
    val q = s"SELECT grp, count(*) AS c FROM $cat.src GROUP BY grp"
    assert(scansMv(spark.sql(q), "agg9"))
    val want = withoutRewrite(spark.sql(q).collect()
      .map(_.toString).sorted.toSeq)
    spark.sql(s"CALL $cat.system.drop_materialized_view('agg9')")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "agg9")))
    assert(!graft.sources.ManifestMaterializedView
      .registered(fs, new org.apache.hadoop.fs.Path(root, "src"))
      .contains("agg9"), "the registry marker must go with the MV")
    val after = spark.sql(q)
    assert(!scansMv(after, "agg9"))
    assert(after.collect().map(_.toString).sorted.toSeq == want)
    // a plain table refuses — DROP TABLE is the tool
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.drop_materialized_view('src')")
    }
    assert(e.getMessage.contains("no materialized view"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "src")))
  }

  test("DISCOVERY is per-source (round 15): candidates come from the " +
    "fact's own _mvreg registry, so planning reads ONE definition no " +
    "matter how many sibling MVs exist in the catalog — the round-14 " +
    "implementation probed every sibling directory") {
    val (cat, root) = freshCat()
    seed(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('agg8', 'src', " +
      "'grp', 'count:*:c')")
    // 40 sibling directories that LOOK like MVs over other sources (the
    // old catalog-wide sweep would probe every one of them)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    (0 until 40).foreach { i =>
      val d = new org.apache.hadoop.fs.Path(root, s"side_mv_$i")
      fs.mkdirs(d)
      val lines = ManifestMaterializedView.encode(
        ManifestMaterializedView.MvDef(s"other_$i", None, Seq("x"),
          Seq(ManifestMaterializedView.AggSpec("count_star", "*", "n")),
          1, 1))
      val out = fs.create(new org.apache.hadoop.fs.Path(d, "_MV.v1"), true)
      out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      out.close()
    }
    val before = ManifestMaterializedView.defReads.get()
    val df = spark.sql(
      s"SELECT grp, count(*) AS c FROM $cat.src GROUP BY grp")
    assert(scansMv(df, "agg8"))
    val reads = ManifestMaterializedView.defReads.get() - before
    assert(reads <= 2,
      s"plan-time definition reads must be flat in catalog size, got $reads")
  }

  test("LEFT-JOIN dim rewrite (round 16): a LEFT JOIN aggregate answers " +
    "from a left-dim MV; kind mismatches never match (inner query vs " +
    "left MV and vice versa compute different multisets); rollup " +
    "composes") {
    import spark.implicits._
    val (cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.fact (sk BIGINT, fb BIGINT, " +
      "f_c BIGINT, amt BIGINT)")
    spark.sql(s"CREATE TABLE $cat.dimc (c_id BIGINT, c_seg STRING)")
    (0L to 9L).map(i => (i, s"seg${i % 3}")).toDF("c_id", "c_seg")
      .writeTo(s"$cat.dimc").append()
    (1L to 200L).map(k => (k, k % 5, k % 20, k % 11))
      .toDF("sk", "fb", "f_c", "amt").writeTo(s"$cat.fact").append()
    spark.sql(s"CALL $cat.system.create_materialized_view('lstar', " +
      "'fact', 'fb,f_c', 'count:*:n,sum:amt:sa,count:c_seg:nc', '', " +
      "'dimc LEFT ON f_c = c_id')")
    val qLeft = s"SELECT fb, f_c, count(*) AS n, sum(amt) AS sa, " +
      s"count(c_seg) AS nc FROM $cat.fact " +
      s"LEFT JOIN $cat.dimc ON f_c = c_id GROUP BY fb, f_c"
    assertSame(qLeft, "lstar", expectRewrite = true)
    // INNER query over the LEFT MV: different multiset, never matches
    assertSame(s"SELECT fb, f_c, count(*) AS n FROM $cat.fact " +
      s"JOIN $cat.dimc ON f_c = c_id GROUP BY fb, f_c", "lstar",
      expectRewrite = false)
    // LEFT query over an INNER MV: same refusal, other direction
    spark.sql(s"CALL $cat.system.create_materialized_view('istar', " +
      "'fact', 'fb', 'count:*:n', '', 'dimc ON f_c = c_id')")
    assertSame(s"SELECT fb, count(*) AS n FROM $cat.fact " +
      s"LEFT JOIN $cat.dimc ON f_c = c_id GROUP BY fb", "istar",
      expectRewrite = false)
    // ...but the LEFT rollup (fb ⊂ {fb, f_c}) folds from the left MV
    assertSame(s"SELECT fb, count(*) AS n, count(c_seg) AS nc " +
      s"FROM $cat.fact LEFT JOIN $cat.dimc ON f_c = c_id GROUP BY fb",
      "lstar", expectRewrite = true)
  }

  // ---- ROLLUP matching (round 16): query keys ⊂ MV keys ---------------

  test("ROLLUP rewrite: a query grouping by a SUBSET of the MV keys " +
    "re-aggregates the MV — counts/sums fold, min/max re-extremize — " +
    "including the GLOBAL (no keys) rollup; a filter over MV keys " +
    "prunes groups before the re-aggregation") {
    val (cat, _) = freshCat()
    seed(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('cube1', 'src', " +
      "'grp,n', 'count:*:c,count:v:cv,sum:n:sn,min:v:mn,max:v:mx')")
    assertSame(s"SELECT grp, count(*) AS c, count(v) AS cv, " +
      s"sum(n) AS sn, min(v) AS mn, max(v) AS mx FROM $cat.src " +
      "GROUP BY grp", "cube1", expectRewrite = true)
    // the other key
    assertSame(s"SELECT n, count(*) AS c, max(v) AS mx FROM $cat.src " +
      "GROUP BY n", "cube1", expectRewrite = true)
    // global rollup: no group keys at all
    assertSame(s"SELECT count(*) AS c, min(v) AS mn FROM $cat.src",
      "cube1", expectRewrite = true)
    // a filter over an MV key that is NOT a query key prunes MV groups
    // before the fold (legal: groups partition rows)
    assertSame(s"SELECT grp, count(*) AS c FROM $cat.src " +
      "WHERE n IN (1, 2, 3) GROUP BY grp", "cube1", expectRewrite = true)
    // non-subset keys never roll up
    assertSame(s"SELECT grp, k, count(*) AS c FROM $cat.src " +
      "GROUP BY grp, k", "cube1", expectRewrite = false)
  }

  test("EXPRESSION rollup: grouping by a deterministic function of MV " +
    "keys (the monthly-over-daily shape) re-aggregates the cube — " +
    "f(keys) is constant within each full-key group, so the fold is " +
    "exact; an expression touching a NON-key column never matches") {
    val (cat, _) = freshCat()
    seed(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('cube3', 'src', " +
      "'grp,n', 'count:*:c,sum:n:sn,min:v:mn,max:v:mx')")
    // coarser granularity derived from a key
    assertSame(s"SELECT n % 4 AS nb, count(*) AS c, sum(n) AS sn, " +
      s"max(v) AS mx FROM $cat.src GROUP BY n % 4", "cube3",
      expectRewrite = true)
    // expressions over BOTH keys, mixed with a bare key
    assertSame(s"SELECT grp, concat(grp, '-', CAST(n % 2 AS STRING)) " +
      s"AS gb, min(v) AS mn FROM $cat.src " +
      "GROUP BY grp, concat(grp, '-', CAST(n % 2 AS STRING))", "cube3",
      expectRewrite = true)
    // an expression referencing a non-key column blocks
    assertSame(s"SELECT k % 2 AS kb, count(*) AS c FROM $cat.src " +
      "GROUP BY k % 2", "cube3", expectRewrite = false)
    // a non-deterministic grouping never matches (shape guard)
    val nd = spark.sql(s"SELECT count(*) AS c FROM $cat.src " +
      "GROUP BY grp, rand() > 2")
    assert(!scansMv(nd, "cube3"))
  }

  test("ROLLUP null discipline: a merged group whose total non-null " +
    "input count is zero answers NULL for sum (ANSI), and counts " +
    "coalesce to 0 on the empty global rollup") {
    import spark.implicits._
    val (cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.nsrc (g STRING, h BIGINT, x BIGINT)")
    Seq(("a", 0L, None), ("a", 1L, Some(5L)), ("a", 1L, Some(7L)),
      ("b", 0L, None), ("b", 0L, None))
      .map { case (g, h, x) => (g, h, x.map(java.lang.Long.valueOf).orNull) }
      .toDF("g", "h", "x").writeTo(s"$cat.nsrc").append()
    spark.sql(s"CALL $cat.system.create_materialized_view('ncube', " +
      "'nsrc', 'g,h', 'count:*:c,count:x:cx,sum:x:sx')")
    val q = s"SELECT g, count(*) AS c, count(x) AS cx, sum(x) AS sx " +
      s"FROM $cat.nsrc GROUP BY g"
    assertSame(q, "ncube", expectRewrite = true)
    val rows = spark.sql(q).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(rows("a") == ((3L, 2L, Some(12L))))
    assert(rows("b") == ((2L, 0L, None)),
      "an all-null merged group must answer NULL sum, 0 count")
  }

  test("ROLLUP preference and drift gates: an exact-key MV beats a " +
    "rollup candidate; fractional sum/avg roll up only under " +
    "allowNumericDrift; rollup composes with stale-tail compensation") {
    import spark.implicits._
    val (cat, _) = freshCat()
    seed(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('cube2', 'src', " +
      "'grp,n', 'count:*:c,sum:v:sv,avg:v:av')")
    spark.sql(s"CALL $cat.system.create_materialized_view('flat2', 'src', " +
      "'grp', 'count:*:c')")
    // exact match wins: no re-aggregation when a Project suffices
    val dfExact = spark.sql(
      s"SELECT grp, count(*) AS c FROM $cat.src GROUP BY grp")
    assert(scansMv(dfExact, "flat2") && !scansMv(dfExact, "cube2"),
      "exact-key candidates must be preferred over rollups:\n" +
        dfExact.queryExecution.optimizedPlan.toString)
    // fractional sum/avg: the same drift gate as the exact path
    val qd = s"SELECT grp, sum(v) AS sv, avg(v) AS av FROM $cat.src " +
      "GROUP BY grp"
    assert(!scansMv(spark.sql(qd), "cube2"),
      "fractional rollup must NOT rewrite by default")
    spark.conf.set("spark.graft.mv.rewrite.allowNumericDrift", "true")
    try {
      val df = spark.sql(qd)
      assert(scansMv(df, "cube2"))
      val got = df.collect().map(r => (r.getString(0),
        math.round(r.getDouble(1) * 1e9), math.round(r.getDouble(2) * 1e9)))
        .sortBy(_._1).toSeq
      val want = withoutRewrite(spark.sql(qd).collect().map(r =>
        (r.getString(0), math.round(r.getDouble(1) * 1e9),
          math.round(r.getDouble(2) * 1e9))).sortBy(_._1).toSeq)
      assert(got == want)
    } finally
      spark.conf.set("spark.graft.mv.rewrite.allowNumericDrift", "false")
    // stale tail + rollup: the Aggregate folds over the COMPENSATED base
    Seq((901L, "g2", 7.0, 3L)).toDF("k", "grp", "v", "n")
      .writeTo(s"$cat.src").append()
    spark.sql(s"CALL $cat.system.drop_materialized_view('flat2')")
    val qc = s"SELECT grp, count(*) AS c FROM $cat.src GROUP BY grp"
    assert(!scansMv(spark.sql(qc), "cube2"),
      "stale rollup must refuse without allowStale")
    spark.conf.set("spark.graft.mv.rewrite.allowStale", "true")
    try {
      // the compensated base reads the MV BY PATH (no catalog ident),
      // so assert the q270 way: executed plan = MV storage + CDF tail
      val df = spark.sql(qc)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("cube2") && p.contains("graft-manifest-changefeed"),
        s"stale rollup must fold the compensated base:\n$p")
      val got = df.collect().map(_.toString).sorted.toSeq
      val want = withoutRewrite(
        spark.sql(qc).collect().map(_.toString).sorted.toSeq)
      assert(got == want, "compensated rollup drifted from direct")
    } finally spark.conf.set("spark.graft.mv.rewrite.allowStale", "false")
  }

  test("FILTER IMPLICATION (round 16): a query whose filter is the MV " +
    "filter AND a key-only residual answers from the filtered MV with " +
    "group pruning; a non-key residual or a missing MV conjunct refuse") {
    val (cat, _) = freshCat()
    seed(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('fagg', 'src', " +
      "'grp', 'count:*:c,sum:n:sn', 'v > 3.0')")
    // exact filter match still rewrites
    assertSame(s"SELECT grp, count(*) AS c, sum(n) AS sn FROM $cat.src " +
      "WHERE v > 3.0 GROUP BY grp", "fagg", expectRewrite = true)
    // MV filter + key-only residual → rewrite, groups pruned
    assertSame(s"SELECT grp, count(*) AS c, sum(n) AS sn FROM $cat.src " +
      "WHERE v > 3.0 AND grp IN ('g1','g2') GROUP BY grp", "fagg",
      expectRewrite = true)
    // conjunct order flipped: the match is a set, not a prefix
    assertSame(s"SELECT grp, count(*) AS c, sum(n) AS sn FROM $cat.src " +
      "WHERE grp <> 'g0' AND v > 3.0 GROUP BY grp", "fagg",
      expectRewrite = true)
    // a NON-key residual filters rows, not groups — refuse
    assertSame(s"SELECT grp, count(*) AS c, sum(n) AS sn FROM $cat.src " +
      "WHERE v > 3.0 AND n > 2 GROUP BY grp", "fagg",
      expectRewrite = false)
    // the MV conjunct missing from the query — refuse (MV rows ⊂ query)
    assertSame(s"SELECT grp, count(*) AS c, sum(n) AS sn FROM $cat.src " +
      "WHERE grp <> 'g0' GROUP BY grp", "fagg", expectRewrite = false)
    // implication composes with ROLLUP: global aggregate over the
    // filtered MV with a key residual folds the pruned groups
    assertSame(s"SELECT count(*) AS c FROM $cat.src " +
      "WHERE v > 3.0 AND grp = 'g1'", "fagg", expectRewrite = true)
  }

  test("COUNT(DISTINCT key cols) rollup (round 16): distinct counts " +
    "over MV key columns re-count the MV's rows — the active-days-per-" +
    "segment shape; non-key distincts never match") {
    val (cat, _) = freshCat()
    seed(cat)
    // two-key cube: (grp, n) — n plays the "day" role
    spark.sql(s"CALL $cat.system.create_materialized_view('cube3', 'src', " +
      "'grp,n', 'count:*:c,sum:k:sk')")
    assertSame(s"SELECT grp, count(DISTINCT n) AS dn, count(*) AS c " +
      s"FROM $cat.src GROUP BY grp", "cube3", expectRewrite = true)
    // multi-arg distinct tuple over keys
    assertSame(s"SELECT count(DISTINCT grp, n) AS dt FROM $cat.src",
      "cube3", expectRewrite = true)
    // a non-key distinct argument cannot derive from the storage
    assertSame(s"SELECT grp, count(DISTINCT v) AS dv FROM $cat.src " +
      "GROUP BY grp", "cube3", expectRewrite = false)
  }

  test("MAINTENANCE-transparent freshness (round 16): a fact or dim " +
    "moved only by row-preserving maintenance (compact, Z-order, " +
    "rewrite_position_deletes) still answers EXACTLY from the MV — " +
    "extrema included, no allowStale opt-in; a data commit still gates") {
    import spark.implicits._
    val (cat, _) = freshCat()
    seed(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('aggm', 'src', " +
      "'grp', 'count:*:c,sum:n:sn,min:v:mn,max:v:mx')")
    val q = s"SELECT grp, count(*) AS c, sum(n) AS sn, min(v) AS mn, " +
      s"max(v) AS mx FROM $cat.src GROUP BY grp"
    assertSame(q, "aggm", expectRewrite = true)
    // plain compaction, then a Z-order pass: neither breaks the rewrite
    spark.sql(s"CALL $cat.system.compact('src', 2)")
    assertSame(q, "aggm", expectRewrite = true)
    spark.sql(s"CALL $cat.system.compact('src', 2, 'k,grp')")
    assertSame(q, "aggm", expectRewrite = true)
    // a MOR delete + its delete-file rewrite: the DELETE gates (rows
    // changed), refresh resumes, and rewrite_position_deletes after the
    // refresh stays transparent
    spark.sql(s"DELETE FROM $cat.src WHERE k = 7")
    assertSame(q, "aggm", expectRewrite = false)
    spark.sql(s"CALL $cat.system.refresh_materialized_view('aggm')")
    assertSame(q, "aggm", expectRewrite = true)
    spark.sql(s"CALL $cat.system.rewrite_position_deletes('src')")
    assertSame(q, "aggm", expectRewrite = true)
    // a COMPACTION (unlists files — decisively not append-only), then
    // a real append: the append kills exactness until the next refresh
    spark.sql(s"CALL $cat.system.compact('src', 2)")
    assertSame(q, "aggm", expectRewrite = true)
    Seq((1000L, "g1", 3.5, 4L)).toDF("k", "grp", "v", "n")
      .writeTo(s"$cat.src").append()
    assertSame(q, "aggm", expectRewrite = false)
    // …but under allowStale the compensation anchors PAST the
    // maintenance prefix (round 16): the rpd+compact steps before the
    // append are not append-only, yet they are provably row-identical,
    // so even the MIN/MAX query compensates — and the fold reads only
    // the append's legs, never a replay of the compaction
    withStale {
      val df = spark.sql(q)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("aggm") && p.contains("graft-manifest-changefeed"),
        s"extrema must compensate across the maintenance prefix:\n$p")
      val got = df.collect().map(_.toString).sorted.toSeq
      val want = withoutRewrite(
        spark.sql(q).collect().map(_.toString).sorted.toSeq)
      assert(got == want, "prefix-skipped compensation drifted")
    }
  }

  test("MID-TAIL maintenance (round 16): append THEN compact — the " +
    "prefix cannot advance, yet extrema still compensate because the " +
    "append-only walk skips the marked step and the fold's feed skips " +
    "its cancelling legs") {
    import spark.implicits._
    val (cat, _) = freshCat()
    seed(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('midm', 'src', " +
      "'grp', 'count:*:c,min:v:mn,max:v:mx')")
    val q = s"SELECT grp, count(*) AS c, min(v) AS mn, max(v) AS mx " +
      s"FROM $cat.src GROUP BY grp"
    assertSame(q, "midm", expectRewrite = true)
    // the continuous-ingest nightly shape, in the ORDER the prefix
    // advance cannot help with: real data first, maintenance after
    Seq((2000L, "g2", 9000.25, 5L), (2001L, "g0", -3.5, 1L))
      .toDF("k", "grp", "v", "n").writeTo(s"$cat.src").append()   // data
    spark.sql(s"CALL $cat.system.compact('src', 1)")              // maint
    assertSame(q, "midm", expectRewrite = false) // exact gate: stale
    withStale {
      val df = spark.sql(q)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("midm") && p.contains("graft-manifest-changefeed"),
        s"extrema must compensate across a MID-TAIL compaction:\n$p")
      val got = df.collect().map(_.toString).sorted.toSeq
      val want = withoutRewrite(
        spark.sql(q).collect().map(_.toString).sorted.toSeq)
      assert(got == want, "mid-tail-skipped compensation drifted")
    }
    // sanity: the new extrema actually came from the compensated legs
    withStale {
      val r = spark.sql(q).collect()
        .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
      assert(r("g2")._2 == 9000.25 && r("g0")._1 == -3.5,
        "the appended extrema must surface through the fold")
    }
  }

  test("MAINTENANCE-transparent freshness over STAR joins: a compacted " +
    "DIM no longer kills the dim-pin gate; a dim DATA change still does") {
    val (cat, _) = freshCat()
    seedStar(cat)
    spark.sql(s"CALL $cat.system.create_materialized_view('starm', " +
      "'fact', 'c_seg,i_cat', 'count:*:n,sum:qty:sq', '', " +
      "'dimc ON f_c = c_id,dimi ON f_i = i_id')")
    val q = s"SELECT c_seg, i_cat, count(*) AS n, sum(qty) AS sq " +
      s"FROM $cat.fact JOIN $cat.dimc ON f_c = c_id " +
      s"JOIN $cat.dimi ON f_i = i_id GROUP BY c_seg, i_cat"
    assertSame(q, "starm", expectRewrite = true)
    spark.sql(s"CALL $cat.system.compact('dimc', 1)")
    assertSame(q, "starm", expectRewrite = true)
    // fact AND dim compacted together: both tails are marker-proven
    spark.sql(s"CALL $cat.system.compact('fact', 2)")
    assertSame(q, "starm", expectRewrite = true)
    // a dim ROW change is not maintenance — the gate holds until refresh
    import spark.implicits._
    Seq((20L, "seg9")).toDF("c_id", "c_seg").writeTo(s"$cat.dimc").append()
    assertSame(q, "starm", expectRewrite = false)
    spark.sql(s"CALL $cat.system.refresh_materialized_view('starm')")
    assertSame(q, "starm", expectRewrite = true)
  }
}
