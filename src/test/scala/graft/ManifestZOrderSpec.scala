package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Z-order compaction (`CALL cat.system.compact(t, n, 'x,y')`,
  * graft.functions.ZOrder): after the rewrite, selective predicates on
  * EITHER clustering column skip most files — a linear sort can only ever
  * serve its first column. Exactness is pinned by comparing a 2-d box
  * aggregate before and after the rewrite.
  */
class ManifestZOrderSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_zorder").toString

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

  /** 100×100 grid written in md5-shuffled order across 8 appends-worth of
    * partitions: every file spans (nearly) the full range of BOTH keys,
    * the layout unordered ingestion produces. */
  private def writeInterleaved(path: String): Unit = {
    import spark.implicits._
    spark.range(10000)
      .select(($"id" % 100).as("x"), ($"id" / 100).as("y"), $"id".as("v"))
      .orderBy(md5(concat_ws(",", $"x", $"y")))
      .repartition(8)
      .write.mode("append").format("graft-manifest").option("path", path).save()
  }

  private def register(path: String): String = {
    val cat = "graft_zo_" + math.abs(path.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root",
      new java.io.File(path).getParent)
    cat
  }

  test("z-order compaction: selective predicates on EITHER column skip " +
    "most files; a 2-d box aggregate is unchanged by the rewrite") {
    import spark.implicits._
    val root = tmpDir()
    val path = s"$root/grid"
    writeInterleaved(path)
    def live() =
      spark.read.format("graft-manifest").option("path", path).load()
    def boxAgg(df: DataFrame) =
      df.filter($"x" >= 20 && $"x" < 40 && $"y" >= 50 && $"y" < 70)
        .agg(count(lit(1)), sum($"v")).collect()(0)
    val beforeBox = boxAgg(live())

    // Interleaved layout: an x-slice overlaps every file's stats range.
    val qxBefore = live().filter($"x" < 10).agg(sum($"v"))
    qxBefore.collect()
    assert(metric(qxBefore, "filesSkipped") == 0L,
      "interleaved files should all overlap an x-slice")

    val cat = register(path)
    val res = spark.sql(
      s"CALL $cat.system.compact('grid', 16, 'x,y')").collect()(0)
    assert(res.getInt(2) == 16, s"expected 16 files after, got $res")

    // Post-rewrite: each file is a z-curve segment — tight min/max box in
    // BOTH dimensions, so either single-column slice skips most files.
    for (slice <- Seq($"x" < 10, $"y" < 10)) {
      val q = live().filter(slice).agg(sum($"v"))
      q.collect()
      assert(metric(q, "filesListed") == 16L)
      assert(metric(q, "filesSkipped") >= 8L,
        s"slice $slice skipped only ${metric(q, "filesSkipped")} of 16")
    }

    // The rewrite moved every row exactly once: box aggregate unchanged.
    assert(boxAgg(live()) == beforeBox)

    // And the box query (selective in both dims) skips even harder than
    // either slice: only files whose 2-d stats box intersects it open.
    val qBox = live()
      .filter($"x" >= 20 && $"x" < 40 && $"y" >= 50 && $"y" < 70)
      .agg(sum($"v"))
    qBox.collect()
    assert(metric(qBox, "filesSkipped") >= 10L,
      s"2-d box skipped only ${metric(qBox, "filesSkipped")} of 16")
  }

  test("z-order over a STRING + numeric pair: skipping proven on both " +
    "dimensions (byte-prefix proxy keeps string range order)") {
    import spark.implicits._
    val root = tmpDir()
    val path = s"$root/sgrid"
    // 20 distinct shipmode-like strings × 500 numerics, interleaved
    spark.range(10000)
      .select(concat(lit("MODE-"), lpad(($"id" % 20).cast("string"), 2, "0"))
          .as("mode"),
        ($"id" / 20).as("seq"), $"id".as("v"))
      .orderBy(md5(concat_ws(",", $"mode", $"seq")))
      .repartition(8)
      .write.mode("append").format("graft-manifest").option("path", path).save()
    def live() =
      spark.read.format("graft-manifest").option("path", path).load()
    val beforeAgg = live().filter($"mode" === "MODE-03")
      .agg(count(lit(1)), sum($"v")).collect()(0)

    val cat = register(path)
    spark.sql(s"CALL $cat.system.compact('sgrid', 16, 'mode,seq')").collect()

    // equality on the string dimension skips most files
    val qs = live().filter($"mode" === "MODE-03").agg(sum($"v"))
    qs.collect()
    assert(metric(qs, "filesListed") == 16L)
    assert(metric(qs, "filesSkipped") >= 8L,
      s"string slice skipped only ${metric(qs, "filesSkipped")} of 16")
    // a string RANGE predicate skips too (proxy preserves byte order) —
    // threshold is looser than equality: repartitionByRange samples its
    // boundaries, so z-segments straddle tile edges
    val qr = live().filter($"mode" >= "MODE-18").agg(sum($"v"))
    qr.collect()
    assert(metric(qr, "filesSkipped") >= 6L,
      s"string range skipped only ${metric(qr, "filesSkipped")} of 16")
    // and the numeric dimension still skips
    val qn = live().filter($"seq" < 50).agg(sum($"v"))
    qn.collect()
    assert(metric(qn, "filesSkipped") >= 8L,
      s"numeric slice skipped only ${metric(qn, "filesSkipped")} of 16")
    // rewrite is exact
    assert(live().filter($"mode" === "MODE-03")
      .agg(count(lit(1)), sum($"v")).collect()(0) == beforeAgg)
  }

  test("z-order over a DATE + numeric pair: the retention layout " +
    "(day, key) skips on both dimensions") {
    import spark.implicits._
    val root = tmpDir()
    val path = s"$root/dgrid"
    spark.range(10000)
      .select(date_add(lit(java.sql.Date.valueOf("2024-01-01")),
          ($"id" % 100).cast("int")).as("day"),
        ($"id" / 100).as("k"), $"id".as("v"))
      .orderBy(md5(concat_ws(",", $"day", $"k")))
      .repartition(8)
      .write.mode("append").format("graft-manifest").option("path", path).save()
    def live() =
      spark.read.format("graft-manifest").option("path", path).load()
    val cat = register(path)
    spark.sql(s"CALL $cat.system.compact('dgrid', 16, 'day,k')").collect()
    val qd = live().filter($"day" < java.sql.Date.valueOf("2024-01-11"))
      .agg(sum($"v"))
    qd.collect()
    assert(metric(qd, "filesListed") == 16L)
    assert(metric(qd, "filesSkipped") >= 8L,
      s"date slice skipped only ${metric(qd, "filesSkipped")} of 16")
    val qk = live().filter($"k" < 10).agg(sum($"v"))
    qk.collect()
    assert(metric(qk, "filesSkipped") >= 8L,
      s"numeric slice skipped only ${metric(qk, "filesSkipped")} of 16")
    // exactness
    assert(live().agg(sum($"v")).head().getLong(0) == (0L until 10000L).sum)
  }

  test("z-order bucket/interleave helpers are order-preserving per " +
    "column and bounded") {
    import spark.implicits._
    val df = spark.range(1000)
      .select(($"id" % 50).cast("double").as("a"),
        ($"id" % 17).cast("double").as("b"))
    val z = df.select(graft.functions.ZOrder.zvalue(df, Seq("a", "b")).as("z"))
      .agg(min($"z"), max($"z")).collect()(0)
    assert(z.getLong(0) >= 0L)
    assert(z.getLong(1) < (1L << 16), "2 columns × 8 bits → z < 2^16")

    // Monotone in each column when the other is fixed: bucket of a is
    // non-decreasing in a.
    val bs = graft.functions.ZOrder.boundaries(df, Seq("a"))
    val buckets = df.select($"a",
        graft.functions.ZOrder.bucket($"a", bs("a")).as("bk"))
      .distinct().orderBy($"a").collect()
    val seq = buckets.map(_.getInt(1)).toSeq
    assert(seq == seq.sorted, "bucket index must be monotone in the value")
    assert(seq.distinct.length == seq.length,
      "50 distinct values over 256 equi-depth buckets stay distinct")
  }

  test("codegen'd bucket binary search ≡ the count-of-bounds-≤-value " +
    "fold, including NULL, NaN, infinities, and boundary duplicates") {
    import spark.implicits._
    val bounds = Array(-3.0, -1.0, -1.0, 0.0, 2.5, 2.5, 2.5, 7.0)
    val vals: Seq[java.lang.Double] = Seq(
      -10.0, -3.0, -2.0, -1.0, -0.5, 0.0, 0.1, 2.5, 3.0, 7.0, 8.0,
      Double.NegativeInfinity, Double.PositiveInfinity, Double.NaN, null)
    val df = vals.toDF("v")
    // the replaced formulation, evaluated literally (nan-safe >=)
    val fold = org.apache.spark.sql.functions.aggregate(
      org.apache.spark.sql.functions.array(
        bounds.map(org.apache.spark.sql.functions.lit(_)).toIndexedSeq: _*),
      org.apache.spark.sql.functions.lit(0),
      (acc, b) => acc + org.apache.spark.sql.functions
        .when($"v" >= b, 1).otherwise(0))
    val rows = df.select($"v",
        graft.functions.ZOrder.bucket($"v", bounds).as("fast"),
        fold.as("slow")).collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"bucket(${r.get(0)}): binary search ${r.getInt(1)} != fold ${r.getInt(2)}")
    }
    // interpreted path (no codegen) agrees too
    val interp = graft.functions.ZOrder.BucketIndex(
      org.apache.spark.sql.graft.ColumnBridge.expression(
        $"v".cast("double")), bounds)
    vals.filter(_ != null).foreach { v =>
      val row = org.apache.spark.sql.catalyst.InternalRow(v.doubleValue())
      val direct = graft.functions.Kernels.upperBound(bounds, v.doubleValue())
      assert(bounds.count(b => java.lang.Double.isNaN(v) ||
          (!java.lang.Double.isNaN(b) && v >= b)) == direct,
        s"kernel drifted from the counting definition at $v")
    }
  }
}
