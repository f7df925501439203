package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** SHREDDED VARIANT STATISTICS + FILE SKIPPING (round 16 —
  * ManifestShred): `TBLPROPERTIES('variant.shred'='doc:$.k:bigint,…')`
  * makes the writer evaluate each declared `variant_get` per row and
  * record min/max/null bounds under synthetic `#stats` positions; the
  * injected [[VariantSkipRule]] lifts comparable `variant_get`
  * conjuncts into the relation's options and the scan prunes files
  * against those bounds. Every test asserts BOTH the pruning metric and
  * exactness against the rule-disabled run. */
class ManifestShredSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def freshCat(tag: String): (String, String) = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_shred_$tag").toString
    val cat = s"graft_shred_${tag}_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def manifestScans(df: DataFrame): Seq[BatchScanExec] = {
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def scansOf(p: SparkPlan): Seq[BatchScanExec] =
      p.collectWithSubqueries {
        case b: BatchScanExec => Seq(b)
        case q: QueryStageExec => scansOf(q.plan)
      }.flatten
    scansOf(finalPlan).filter(_.scan.description().contains("graft-manifest"))
  }

  private def metric(df: DataFrame, name: String): Long =
    manifestScans(df).flatMap(_.metrics.get(name)).map(_.value).sum

  /** 10 single-file commits with DISJOINT `$.k` ranges and clustered
    * `$.cat` values — the layout time-keyed variant ingest produces. */
  private def seed(cat: String): Unit =
    (0 until 10).foreach { c =>
      spark.range(c * 100, (c + 1) * 100).selectExpr("id",
        s"""parse_json(concat('{"k":', id, ',"cat":"c$c","w":', """ +
          """id % 7, '.5}')) AS doc""")
        .coalesce(1).writeTo(s"$cat.t").append()
    }

  private def checkExact(cat: String, sql: String): DataFrame = {
    val df = spark.sql(sql)
    val got = df.collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.variant.skip", "false")
    val want =
      try spark.sql(sql).collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.graft.variant.skip", "true")
    assert(got == want, s"shred skipping changed the answer for: $sql")
    df
  }

  test("declared variant.shred paths SKIP files on variant_get " +
    "range/equality/null predicates — results exact against the " +
    "rule-disabled run, pruning observable in the scan metrics") {
    val (cat, _) = freshCat("skip")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, doc VARIANT) " +
      "TBLPROPERTIES('variant.shred'=" +
      "'doc:$.k:bigint,doc:$.cat:string,doc:$.w:double')")
    seed(cat)
    // range on the bigint path: 10 files, one matching
    val q1 = checkExact(cat,
      s"SELECT id FROM $cat.t WHERE variant_get(doc, '$$.k', 'bigint') > 950")
    assert(q1.count() == 49)
    assert(metric(q1, "filesSkipped") >= 9L,
      s"bigint range must prune, skipped ${metric(q1, "filesSkipped")}")
    // equality on the string path (clustered per file)
    val q2 = checkExact(cat,
      s"SELECT id FROM $cat.t WHERE variant_get(doc, '$$.cat', 'string') = 'c3'")
    assert(q2.count() == 100)
    assert(metric(q2, "filesSkipped") >= 9L,
      s"string equality must prune, skipped ${metric(q2, "filesSkipped")}")
    // reversed operand order + conjunction with an ordinary predicate
    val q3 = checkExact(cat,
      s"SELECT id FROM $cat.t WHERE 150 > variant_get(doc, '$$.k', 'bigint') " +
        "AND id >= 0")
    assert(q3.count() == 150)
    assert(metric(q3, "filesSkipped") >= 8L)
    // a predicate nothing satisfies plans ZERO files
    val q4 = checkExact(cat,
      s"SELECT id FROM $cat.t WHERE variant_get(doc, '$$.k', 'bigint') < -5")
    assert(q4.count() == 0 && metric(q4, "filesPlanned") == 0L)
    // an UNDECLARED path never skips (conservative)
    val q5 = checkExact(cat,
      s"SELECT id FROM $cat.t WHERE variant_get(doc, '$$.nope', 'bigint') > 0")
    assert(metric(q5, "filesSkipped") == 0L)
    // a TYPE-mismatched extraction never skips (different cast domain)
    val q6 = checkExact(cat,
      s"SELECT id FROM $cat.t WHERE variant_get(doc, '$$.k', 'double') > 950.0")
    assert(q6.count() == 49 && metric(q6, "filesSkipped") == 0L)
    // missing-path nulls: IS NOT NULL keeps everything (k always set);
    // IS NULL proves every file row-free
    val q7 = checkExact(cat,
      s"SELECT id FROM $cat.t WHERE variant_get(doc, '$$.k', 'bigint') IS NULL")
    assert(q7.count() == 0 && metric(q7, "filesPlanned") == 0L)
  }

  test("ERROR-MASKING GUARD: a file where the declared cast fails " +
    "records no shred stats and is NEVER skipped — the query's error " +
    "surfaces instead of vanishing with the pruned file") {
    val (cat, _) = freshCat("err")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, doc VARIANT) " +
      "TBLPROPERTIES('variant.shred'='doc:$.k:bigint')")
    spark.range(0, 50).selectExpr("id",
      """parse_json(concat('{"k":', id, '}')) AS doc""")
      .coalesce(1).writeTo(s"$cat.t").append()
    // this file's $.k is a non-numeric STRING: variant_get(..,'bigint')
    // throws on it at query time
    spark.range(50, 60).selectExpr("id",
      """parse_json('{"k":"not-a-number"}') AS doc""")
      .coalesce(1).writeTo(s"$cat.t").append()
    val q = spark.sql(s"SELECT id FROM $cat.t " +
      s"WHERE variant_get(doc, '$$.k', 'bigint') > 1000000")
    // the poisoned file must be PLANNED (no stats recorded for it) and
    // the query must THROW, exactly like the unskipped plan would
    assert(manifestScans(q).map(_.inputPartitions.length).sum >= 1,
      "the cast-failing file must never be pruned")
    intercept[Exception] { q.collect() }
    // try_variant_get turns the failure into null — and then the clean
    // file's bounds still prune IT, while the poisoned one is planned
    val qt = checkExact(cat, s"SELECT id FROM $cat.t " +
      s"WHERE try_variant_get(doc, '$$.k', 'bigint') > 1000000")
    assert(qt.count() == 0)
  }

  test("ALTER TABLE SET variant.shred starts shredding FUTURE files; " +
    "pre-declaration files lack the synthetic stats and never skip; " +
    "'none' clears the declaration; non-variant columns refuse") {
    val (cat, root) = freshCat("alter")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, doc VARIANT)")
    spark.range(0, 100).selectExpr("id",
      """parse_json(concat('{"k":', id, '}')) AS doc""")
      .coalesce(1).writeTo(s"$cat.t").append()
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES(" +
      "'variant.shred'='doc:$.k:bigint')")
    spark.range(100, 200).selectExpr("id",
      """parse_json(concat('{"k":', id, '}')) AS doc""")
      .coalesce(1).writeTo(s"$cat.t").append()
    val q = checkExact(cat,
      s"SELECT id FROM $cat.t WHERE variant_get(doc, '$$.k', 'bigint') > 250")
    assert(q.count() == 0)
    // the post-declaration file skips; the pre-declaration one cannot
    assert(metric(q, "filesSkipped") == 1L && metric(q, "filesPlanned") == 1L)
    // SHOW TBLPROPERTIES round-trips the declaration
    val shown = spark.sql(s"SHOW TBLPROPERTIES $cat.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("variant.shred").contains("doc:$.k:bigint"))
    // clearing stops future tracking
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('variant.shred'='none')")
    spark.range(200, 300).selectExpr("id",
      """parse_json(concat('{"k":', id, '}')) AS doc""")
      .coalesce(1).writeTo(s"$cat.t").append()
    val lines = ManifestFiles.linesOf(new org.apache.hadoop.fs.Path(root, "t")
      .getFileSystem(spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(root, "t"), None)
    assert(ManifestShred.fromLines(lines).isEmpty, "clear must drop the conf")
    // a non-variant column refuses at declaration time
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES(" +
        "'variant.shred'='id:$.k:bigint')")
    }
    assert(e.getMessage.contains("VARIANT"))
  }

  test("INDEX STABILITY across re-declaration (round-16 self-review): " +
    "a surviving path keeps its synthetic stats position, a re-added " +
    "path draws a FRESH index — old files' bounds are never " +
    "reinterpreted as a different path's") {
    val (cat, root) = freshCat("reidx")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, doc VARIANT) " +
      "TBLPROPERTIES('variant.shred'='doc:$.a:bigint,doc:$.b:bigint')")
    // one file: $.a ∈ [0,100), $.b ∈ [1000,1100) — disjoint domains
    spark.range(0, 100).selectExpr("id",
      """parse_json(concat('{"a":', id, ',"b":', id + 1000, '}')) AS doc""")
      .coalesce(1).writeTo(s"$cat.t").append()
    // drop $.a from the declaration: naive re-numbering would hand $.b
    // index 0 and evaluate the old file's $.a bounds (max 99) for $.b
    // predicates — wrongly skipping the file and losing all 100 rows
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES(" +
      "'variant.shred'='doc:$.b:bigint')")
    val q = checkExact(cat,
      s"SELECT id FROM $cat.t WHERE variant_get(doc, '$$.b', 'bigint') > 500")
    assert(q.count() == 100,
      "the surviving path's bounds must keep answering for $.b")
    assert(metric(q, "filesPlanned") == 1L && metric(q, "filesSkipped") == 0L)
    // ... while a genuinely out-of-range $.b predicate still skips via
    // the file's own $.b bounds at the PRESERVED index
    val q2 = checkExact(cat,
      s"SELECT id FROM $cat.t WHERE variant_get(doc, '$$.b', 'bigint') > 5000")
    assert(metric(q2, "filesSkipped") == 1L)
    // re-adding $.a draws a FRESH index (2), never reusing retired 0
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES(" +
      "'variant.shred'='doc:$.b:bigint,doc:$.a:bigint')")
    val dir = new org.apache.hadoop.fs.Path(root, "t")
    val specs = ManifestShred.fromLines(ManifestFiles.linesOf(
      dir.getFileSystem(spark.sessionState.newHadoopConf()), dir, None))
    assert(specs.map(s => s.path -> s.i).toMap == Map("$.b" -> 1, "$.a" -> 2),
      s"surviving $$.b keeps index 1, re-added $$.a draws fresh 2: $specs")
    // the old file's $.a stats live at RETIRED index 0 — a $.a query
    // must not skip it (no stats at the fresh position), and stays exact
    val q3 = checkExact(cat,
      s"SELECT id FROM $cat.t WHERE variant_get(doc, '$$.a', 'bigint') > 5000")
    assert(metric(q3, "filesSkipped") == 0L,
      "re-added path must not consult retired-index bounds")
  }

  test("SEGMENT-LEVEL shred pruning: a selective variant_get predicate " +
    "skips whole segments unread (the #segstats union covers the " +
    "synthetic positions)") {
    val (cat, root) = freshCat("seg")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, doc VARIANT) " +
      "TBLPROPERTIES('variant.shred'='doc:$.k:bigint')")
    // 40 files across 40 commits → multiple segments, disjoint k ranges
    (0 until 40).foreach { c =>
      spark.range(c * 50, (c + 1) * 50).selectExpr("id",
        """parse_json(concat('{"k":', id, '}')) AS doc""")
        .coalesce(1).writeTo(s"$cat.t").append()
    }
    val q = checkExact(cat,
      s"SELECT id FROM $cat.t WHERE variant_get(doc, '$$.k', 'bigint') " +
        "BETWEEN 990 AND 1010")
    assert(q.count() == 21)
    assert(metric(q, "filesSkipped") >= 35L)
    assert(metric(q, "segmentsPruned") >= 1L,
      s"whole segments must prune unread, got " +
        s"${metric(q, "segmentsPruned")}")
  }
}
