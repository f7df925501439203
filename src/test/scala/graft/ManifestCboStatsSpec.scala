package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** COLUMN-LEVEL statistics for Spark's cost-based optimizer, live from
  * the manifest (round 14): declared `stats.ndv.columns` track a
  * per-file HyperLogLog as rows are written (`#ndv` rider lines,
  * ManifestNdv), and every scan merges the KEPT files' sketches plus
  * the exact `#stats` min/max/null counts into DSv2
  * `Statistics.columnStats()` — the SPARK-41378 seam `transformV2Stats`
  * turns into catalyst attributeStats. Unlike ANALYZE TABLE (the
  * reference's only column-stats source,
  * `sql/core/.../command/AnalyzeColumnCommand.scala` in 2.1-era Spark),
  * these never go stale: they ride every commit, and they are
  * POST-PRUNING — a filtered scan reports the statistics of the files
  * that survive, which is what join planning actually needs. At 100 TB
  * a wrong first join is the difference between a 10⁶- and a
  * 10¹²-row intermediate; this is the machinery that prevents it on
  * governed tables without any ANALYZE job. */
class ManifestCboStatsSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def freshCat(tag: String): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_cbo_$tag").toString
    val cat = s"graft_cbo_${tag}_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def attrStats(df: DataFrame):
      Map[String, org.apache.spark.sql.catalyst.plans.logical.ColumnStat] = {
    val rel = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r
    }
    assert(rel.nonEmpty, "no DSv2 scan relation in:\n" +
      df.queryExecution.optimizedPlan)
    rel.head.stats.attributeStats.map { case (a, s) => a.name -> s }.toMap
  }

  private def withCbo[A](f: => A): A = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try f finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("declared stats.ndv.columns surface distinctCount/nullCount/" +
    "min/max as catalyst attributeStats — ndv within HLL tolerance, " +
    "the rest exact") {
    val (cat, _) = freshCat("basic")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, grp STRING, v DOUBLE) " +
      "TBLPROPERTIES('stats.ndv.columns'='k,grp')")
    // 3 files, 30k rows, k distinct = 30k, grp distinct = 100, nulls in v
    (0 until 3).foreach { c =>
      spark.range(c * 10000, (c + 1) * 10000)
        .select($"id".as("k"),
          concat(lit("g"), ($"id" % 100).cast("string")).as("grp"),
          when($"id" % 10 === 0, lit(null)).otherwise($"id" * 0.5)
            .cast("double").as("v"))
        .repartition(2)
        .writeTo(s"$cat.t").append()
    }
    val st = withCbo(attrStats(spark.table(s"$cat.t")
      .select($"k", $"grp", $"v")))
    val k = st("k")
    assert(k.distinctCount.isDefined)
    val ndvK = k.distinctCount.get.toDouble
    assert(math.abs(ndvK - 30000.0) / 30000.0 < 0.15,
      s"k ndv $ndvK not within 15% of 30000")
    assert(k.nullCount.contains(BigInt(0)))
    assert(k.min.contains(0L) && k.max.contains(29999L),
      s"k bounds ${k.min}/${k.max}")
    val g = st("grp")
    assert(g.distinctCount.isDefined)
    val ndvG = g.distinctCount.get.toDouble
    assert(math.abs(ndvG - 100.0) / 100.0 < 0.15, s"grp ndv $ndvG")
    // strings never report truncated bounds as exact min/max
    assert(g.min.isEmpty && g.max.isEmpty)
    // v is NOT a declared ndv column: null count + bounds still report
    val v = st("v")
    assert(v.distinctCount.isEmpty)
    assert(v.nullCount.contains(BigInt(3000)), s"v nulls ${v.nullCount}")
  }

  test("column stats are POST-PRUNING: a filtered scan reports the " +
    "surviving files' ndv and bounds, not the table's") {
    val (cat, _) = freshCat("pruned")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, grp STRING) " +
      "TBLPROPERTIES('stats.ndv.columns'='k')")
    // two value-disjoint files
    spark.range(0, 5000).select($"id".as("k"),
      lit("lo").as("grp")).coalesce(1).writeTo(s"$cat.t").append()
    spark.range(100000, 101000).select($"id".as("k"),
      lit("hi").as("grp")).coalesce(1).writeTo(s"$cat.t").append()
    val st = withCbo(attrStats(
      spark.table(s"$cat.t").filter($"k" >= 100000L)))
    val k = st("k")
    assert(k.min.contains(100000L) && k.max.contains(100999L),
      s"post-pruning bounds ${k.min}/${k.max}")
    val ndv = k.distinctCount.get.toDouble
    assert(math.abs(ndv - 1000.0) / 1000.0 < 0.15,
      s"post-pruning ndv $ndv should track the surviving file (1000), " +
        "not the table (6000)")
  }

  test("partial sketch coverage degrades to NO distinctCount (never a " +
    "wrong one): files written before ALTER..SET stats.ndv.columns " +
    "suppress ndv until a rewrite; nullCount/bounds still report") {
    val (cat, _) = freshCat("degrade")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")
    spark.range(0, 1000).select($"id".as("k"))
      .coalesce(1).writeTo(s"$cat.t").append() // no sketch
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES(" +
      "'stats.ndv.columns'='k')")
    spark.range(1000, 2000).select($"id".as("k"))
      .coalesce(1).writeTo(s"$cat.t").append() // sketched
    val st = withCbo(attrStats(spark.table(s"$cat.t")))
    val k = st("k")
    assert(k.distinctCount.isEmpty,
      "a kept file without a sketch must suppress distinctCount")
    assert(k.nullCount.contains(BigInt(0)))
    assert(k.min.contains(0L) && k.max.contains(1999L))
    // CALL compact rewrites every byte under the declared conf — the
    // rewritten files carry sketches, ndv returns
    spark.sql(s"CALL $cat.system.compact('t')")
    val st2 = withCbo(attrStats(spark.table(s"$cat.t")))
    assert(st2("k").distinctCount.isDefined,
      "compaction under the declared ndv conf must restore distinctCount")
    val ndv = st2("k").distinctCount.get.toDouble
    assert(math.abs(ndv - 2000.0) / 2000.0 < 0.15, s"post-compact ndv $ndv")
  }

  test("live delete state degrades COUNT-class stats (round-15 advice): " +
    "MOR vectors / equality deletes hide rows the per-file counts still " +
    "include, so nullCount/distinctCount go absent while min/max keep " +
    "reporting the sound envelope; CALL compact restores the counts") {
    val (cat, _) = freshCat("dels")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES('stats.ndv.columns'='k', " +
      "'delete.mode'='merge-on-read')")
    spark.range(0, 2000)
      .select($"id".as("k"), when($"id" % 10 === 0, lit(null))
        .otherwise($"id" * 1.0).as("v"))
      .coalesce(2).writeTo(s"$cat.t").append()
    val clean = withCbo(attrStats(spark.table(s"$cat.t")))
    assert(clean("k").distinctCount.isDefined &&
      clean("v").nullCount.contains(BigInt(200)))
    spark.sql(s"DELETE FROM $cat.t WHERE k % 4 = 1") // MOR vectors
    val degraded = withCbo(attrStats(spark.table(s"$cat.t")))
    assert(degraded("k").distinctCount.isEmpty,
      "live delete vectors must suppress distinctCount (it overcounts)")
    assert(degraded("v").nullCount.isEmpty,
      "live delete vectors must suppress nullCount (it overcounts)")
    assert(degraded("k").min.contains(0L) && degraded("k").max.contains(1999L),
      "bounds stay: deletes only remove rows, the envelope remains sound")
    spark.sql(s"CALL $cat.system.compact('t')")
    val restored = withCbo(attrStats(spark.table(s"$cat.t")))
    assert(restored("k").distinctCount.isDefined &&
      restored("v").nullCount.isDefined,
      "compaction materializes the deletes and restores exact counts")
  }

  test("EQUI-HEIGHT HISTOGRAMS ride commits (round 15): a declared " +
    "stats.histogram.columns column corrects range-predicate " +
    "selectivity that NDV+bounds gets catastrophically wrong on skew — " +
    "and the corrected estimate flips the join's broadcast side") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val (cat, _) = freshCat("hist")
    // 100k rows; 99% of x in [0,10), 1% spread across (10, ~100k] —
    // uniformity over the [0, 100010] bounds estimates `x > 10` at ~99%
    // of rows; the histogram knows it is ~1%
    def seedSkew(t: String, props: String): Unit = {
      spark.sql(s"CREATE TABLE $cat.$t (k BIGINT, x DOUBLE) $props")
      spark.range(0, 100000).selectExpr("id AS k",
        "CASE WHEN id % 100 = 0 THEN 10.0 + id ELSE CAST(id % 10 AS DOUBLE) " +
          "END AS x")
        .coalesce(2).writeTo(s"$cat.$t").append()
    }
    seedSkew("skew_h", "TBLPROPERTIES('stats.histogram.columns'='x')")
    seedSkew("skew_p", "")
    spark.sql(s"CREATE TABLE $cat.mid (k BIGINT, pay STRING)")
    spark.range(0, 20000).selectExpr("id AS k",
      "repeat('m', 20) AS pay").writeTo(s"$cat.mid").append()
    withCbo {
      val hs = attrStats(spark.table(s"$cat.skew_h"))
      assert(hs("x").histogram.isDefined,
        "declared histogram column must surface catalyst bins")
      val bins = hs("x").histogram.get.bins
      assert(bins.length > 8 && bins.head.lo == 0.0 &&
        bins.last.hi > 10000.0, s"bins malformed: ${bins.take(3).toSeq}")
      def estRows(t: String): BigInt =
        spark.table(s"$cat.$t").filter(col("x") > 10.0)
          .queryExecution.optimizedPlan.stats.rowCount
          .getOrElse(sys.error("CBO must produce a rowCount"))
      val withHist = estRows("skew_h")
      val uniform = estRows("skew_p")
      assert(withHist < 5000,
        s"histogram must price the skewed tail at ~1%, got $withHist")
      assert(uniform > 50000,
        s"the uniformity heuristic should misprice this at ~99% " +
          s"(sanity check of the contrast), got $uniform")
      // the estimate flips a physical decision: under a 100 KB
      // broadcast threshold the correctly-priced filtered fact (~1k
      // rows) broadcasts, the mispriced one (~99k rows) cannot
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "100000")
      try {
        def broadcastsSkew(t: String): Boolean = {
          val q = spark.table(s"$cat.$t").filter(col("x") > 10.0)
            .join(spark.table(s"$cat.mid"), "k")
            .groupBy().count()
          val plan = q.queryExecution.executedPlan match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              a.executedPlan
            case p => p
          }
          plan.exists {
            case b: BroadcastHashJoinExec =>
              val build = b.buildSide match {
                case org.apache.spark.sql.catalyst.optimizer.BuildLeft =>
                  b.left
                case org.apache.spark.sql.catalyst.optimizer.BuildRight =>
                  b.right
              }
              build.toString.contains(t)
            case _ => false
          }
        }
        assert(broadcastsSkew("skew_h"),
          "the histogram-priced filtered fact must broadcast")
        assert(!broadcastsSkew("skew_p"),
          "the uniformity-priced fact must NOT broadcast (too big)")
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
    // coverage gates: a takedown (delete state) degrades the histogram;
    // compaction rebuilds coverage and it returns
    spark.sql(s"ALTER TABLE $cat.skew_h SET TBLPROPERTIES(" +
      "'delete.mode'='merge-on-read')")
    spark.sql(s"DELETE FROM $cat.skew_h WHERE k % 1000 = 7")
    val degraded = withCbo(attrStats(spark.table(s"$cat.skew_h")))
    assert(degraded("x").histogram.isEmpty,
      "live delete state must suppress the histogram (mass overcounts)")
    spark.sql(s"CALL $cat.system.compact('skew_h')")
    val restored = withCbo(attrStats(spark.table(s"$cat.skew_h")))
    assert(restored("x").histogram.isDefined,
      "compaction materializes deletes and restores the histogram")
  }

  test("live manifest stats drive cbo.joinReorder: the selective small " +
    "table moves first with NO ANALYZE ever run") {
    val (cat, _) = freshCat("reorder")
    val dir = "/root/testdata/sf0.01"
    val ndvCols = Map(
      "lineitem" -> "l_orderkey",
      "orders" -> "o_orderkey,o_custkey",
      "customer" -> "c_custkey,c_acctbal")
    for (t <- Seq("lineitem", "orders", "customer")) {
      val src = graft.Tables.df(spark, dir, t)
      val cols = src.schema.fieldNames
        .map(n => s"$n ${src.schema(n).dataType.sql}").mkString(", ")
      spark.sql(s"CREATE TABLE $cat.$t ($cols) " +
        s"TBLPROPERTIES('stats.ndv.columns'='${ndvCols(t)}')")
      src.writeTo(s"$cat.$t").append()
    }
    val sql = s"""
      SELECT c.c_mktsegment, COUNT(*) AS n
      FROM $cat.lineitem l
      JOIN $cat.orders o ON l.l_orderkey = o.o_orderkey
      JOIN $cat.customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_acctbal > 9900.0
      GROUP BY c.c_mktsegment"""
    def leaves(plan: LogicalPlan): Seq[String] = plan.collectLeaves().collect {
      case r: DataSourceV2ScanRelation =>
        "(lineitem|orders|customer)".r
          .findFirstIn(r.scan.description()).getOrElse("?")
    }
    def leavesWith(cbo: Boolean): Seq[String] = {
      spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
      try leaves(spark.sql(sql).queryExecution.optimizedPlan)
      finally {
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      }
    }
    val plain = leavesWith(cbo = false)
    val reordered = leavesWith(cbo = true)
    assert(plain.indexOf("customer") == 2,
      s"textual order should join customer last, got $plain")
    assert(reordered.indexOf("customer") < 2,
      s"CBO over live manifest stats should pull the filtered customer " +
        s"earlier: $reordered (textual $plain)")
    // and the reordered plan still answers correctly
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val a = try spark.sql(sql).collect().map(r =>
        (r.getString(0), r.getLong(1))).toMap
      finally {
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      }
    val b = spark.sql(sql).collect().map(r =>
      (r.getString(0), r.getLong(1))).toMap
    assert(a == b, "reordered plan changed the answer")
  }

  test("type widening suppresses the widened column's stats (stale " +
    "float text / re-hashed sketches can never mislead the optimizer)") {
    val (cat, _) = freshCat("widen")
    spark.sql(s"CREATE TABLE $cat.t (k INT, v FLOAT) " +
      "TBLPROPERTIES('stats.ndv.columns'='k,v')")
    spark.range(0, 100).select($"id".cast("int").as("k"),
      ($"id" * 0.1f).cast("float").as("v"))
      .coalesce(1).writeTo(s"$cat.t").append()
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN v TYPE DOUBLE")
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN k TYPE BIGINT")
    val st = withCbo(attrStats(spark.table(s"$cat.t")))
    assert(!st.contains("v") || (st("v").distinctCount.isEmpty &&
      st("v").min.isEmpty && st("v").max.isEmpty),
      s"widened float column must report no stats, got ${st.get("v")}")
    assert(!st.contains("k") || st("k").distinctCount.isEmpty,
      s"widened int column must report no stats, got ${st.get("k")}")
  }

  test("non-finite doubles sample like nulls (round-16 advice): NaN/∞ " +
    "never become HistogramBin bounds — catalyst's range arithmetic " +
    "over them produces garbage estimates") {
    val (cat, _) = freshCat("nonfinite")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, x DOUBLE) " +
      "TBLPROPERTIES('stats.histogram.columns'='x')")
    spark.range(0, 10000).selectExpr("id AS k",
      "CASE WHEN id % 7 = 0 THEN double('NaN') " +
        "WHEN id % 11 = 0 THEN double('Infinity') " +
        "WHEN id % 13 = 0 THEN double('-Infinity') " +
        "ELSE CAST(id % 50 AS DOUBLE) END AS x")
      .coalesce(2).writeTo(s"$cat.t").append()
    // ±∞ live in the exact `#stats` bounds, so stretching an outer bin
    // to them would mint an infinite bound — the scan must REFUSE the
    // histogram instead
    val st = withCbo(attrStats(spark.table(s"$cat.t")))
    assert(st.get("x").forall(_.histogram.isEmpty),
      "infinite exact bounds must suppress the histogram entirely")
    // NaN alone: NaN orders GREATEST in the canonical double order, so
    // the exact `#stats` max is NaN — the histogram is refused rather
    // than anchored on a bound range arithmetic cannot price
    spark.sql(s"CREATE TABLE $cat.nanonly (k BIGINT, x DOUBLE) " +
      "TBLPROPERTIES('stats.histogram.columns'='x')")
    spark.range(0, 10000).selectExpr("id AS k",
      "CASE WHEN id % 7 = 0 THEN double('NaN') " +
        "ELSE CAST(id % 50 AS DOUBLE) END AS x")
      .coalesce(2).writeTo(s"$cat.nanonly").append()
    val stN = withCbo(attrStats(spark.table(s"$cat.nanonly")))
    assert(stN.get("x").forall(_.histogram.isEmpty),
      "a NaN exact max must suppress the histogram")
    // an all-finite sibling written the same way DOES surface one —
    // the refusal is about the bounds, not the declaration
    spark.sql(s"CREATE TABLE $cat.finite (k BIGINT, x DOUBLE) " +
      "TBLPROPERTIES('stats.histogram.columns'='x')")
    spark.range(0, 10000).selectExpr("id AS k",
      "CAST(id % 50 AS DOUBLE) AS x")
      .coalesce(2).writeTo(s"$cat.finite").append()
    val hF = withCbo(attrStats(spark.table(s"$cat.finite")))
      .get("x").flatMap(_.histogram)
    assert(hF.isDefined, "finite column must surface a histogram")
    hF.get.bins.foreach { b =>
      assert(java.lang.Double.isFinite(b.lo) &&
        java.lang.Double.isFinite(b.hi),
        s"non-finite histogram bound: [${b.lo}, ${b.hi}]")
    }
    // and the emitted per-file samples themselves carry only finite
    // values (the guard is at the sampler, not a read-time patch)
    val root = spark.conf.get(s"spark.sql.catalog.$cat.root")
    val dir = new org.apache.hadoop.fs.Path(root, "t")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val lines = ManifestFiles.linesOf(fs, dir, None)
    val hist = ManifestHist.fromLines(lines)
    assert(hist.nonEmpty, "histogram samples must still be emitted")
    hist.values.flatMap(_.values).foreach { case (vs, nn) =>
      assert(vs.forall(java.lang.Double.isFinite),
        "non-finite value leaked into a #hist sample")
      assert(nn > 0, "finite-value count must be positive")
    }
  }

  test("monomorphic write-path accessors match the generic hash/toDouble " +
      "for every supported type (round-17 sketch-tracker specialization)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val dec = Decimal(new java.math.BigDecimal("1234.5600"), 18, 4)
    val cases: Seq[(DataType, Any)] = Seq(
      (LongType, 42L), (LongType, Long.MinValue),
      (IntegerType, -7), (ShortType, 3.toShort), (ByteType, 9.toByte),
      (BooleanType, true), (BooleanType, false),
      (DoubleType, 3.5d), (DoubleType, -0.0d), (DoubleType, Double.NaN),
      (FloatType, 0.1f), (FloatType, -0.0f),
      (StringType, UTF8String.fromString("héllo")),
      (StringType, UTF8String.fromString("")),
      (DateType, 19876), (TimestampType, 1234567890123456L),
      (TimestampNTZType, 987654321L),
      (DecimalType(18, 4), dec))
    cases.foreach { case (dt, v) =>
      val row = InternalRow(v)
      assert(ManifestNdv.hashGetter(dt)(row, 0) ==
        ManifestNdv.hash(dt, row.get(0, dt)),
        s"ndv hash diverged for $dt value $v")
      if (ManifestHist.capable(dt)) {
        val spec = ManifestHist.doubleGetter(dt)(row, 0)
        val gen = ManifestHist.toDouble(dt, row.get(0, dt))
        assert(spec == gen || (spec.isNaN && gen.isNaN),
          s"hist double diverged for $dt value $v: $spec vs $gen")
      }
    }
  }
}
