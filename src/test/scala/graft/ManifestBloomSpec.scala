package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Parquet BLOOM FILTERS on declared columns (round 12 — Iceberg's
  * `write.parquet.bloom-filter-enabled`): `TBLPROPERTIES(
  * 'bloom.columns'='k')` persists a `#tableconf,bloom` line; every
  * write route enables a chunk-level bloom on those columns, and point
  * lookups on values the stats RANGE covers but the column never holds
  * skip row groups the min/max could not. The test forces the honest
  * worst case for stats: unsorted data (every row group spans the full
  * range) with dictionary encoding OFF (so nothing else can skip). */
class ManifestBloomSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def scans(p: SparkPlan): Seq[BatchScanExec] = p.collectWithSubqueries {
      case b: BatchScanExec => Seq(b)
      case q: QueryStageExec => scans(q.plan)
    }.flatten
    scans(finalPlan).flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
  }

  test("bloom.columns: point lookups on absent-but-in-range values skip " +
    "row groups stats cannot; the no-bloom twin reads everything") {
    val root = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val cat = "graft_bloom_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val hconf = spark.sparkContext.hadoopConfiguration
    val prevBlock = Option(hconf.get("parquet.block.size"))
    val prevDict = Option(hconf.get("parquet.enable.dictionary"))
    hconf.setLong("parquet.block.size", 64 * 1024) // many row groups
    hconf.setBoolean("parquet.enable.dictionary", false) // bloom or nothing
    try {
      // k = (id%1000)*1000 + id/1000: unsorted — every row group's
      // [min,max] spans nearly the whole domain, but any value with
      // low-part >= 200 never occurs
      def rows() = spark.range(0, 200000).select(
        (($"id" % 1000) * 1000 + $"id" / 1000).as("k"), $"id".as("v"))
      spark.sql(s"CREATE TABLE $cat.b (k BIGINT, v BIGINT) " +
        "TBLPROPERTIES('bloom.columns'='k')")
      rows().coalesce(1).writeTo(s"$cat.b").append()
      spark.sql(s"CREATE TABLE $cat.nb (k BIGINT, v BIGINT)")
      rows().coalesce(1).writeTo(s"$cat.nb").append()

      // the footer proves the filters exist (bloom offsets recorded)
      val dir = new Path(s"$root/b")
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val dataFile = fs.listStatus(dir).map(_.getPath)
        .find(_.getName.startsWith("part-")).get
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          dataFile, spark.sessionState.newHadoopConf()))
      try {
        val blocks = reader.getFooter.getBlocks
        assert(blocks.size() > 1, s"expected many row groups, got ${blocks.size()}")
        blocks.forEach { b =>
          assert(b.getColumns.get(0).getBloomFilterOffset >= 0,
            "k column chunk missing its bloom filter")
          assert(b.getColumns.get(1).getBloomFilterOffset < 0,
            "v must NOT carry a bloom (only declared columns pay the bytes)")
        }
      } finally reader.close()

      // absent-but-in-range probe: 500999 sits inside every group's
      // stats range, never occurs (low part 999 >= 200)
      val withBloom = scanRows(spark.table(s"$cat.b").filter($"k" === 500999L))
      val without = scanRows(spark.table(s"$cat.nb").filter($"k" === 500999L))
      assert(withBloom == 0L, s"bloom should skip every row group, read $withBloom")
      assert(without == 200000L,
        s"the no-bloom twin has nothing to skip with, read $without")
      // present values still found exactly
      assert(spark.table(s"$cat.b").filter($"k" === 500123L).count() == 1L)
      assert(spark.sql(s"SELECT count(*) FROM $cat.b").head().getLong(0)
        == 200000L)
      // bloom EVOLUTION: the no-bloom twin adopts blooms via ALTER;
      // only files written after the flip carry them
      spark.sql(s"ALTER TABLE $cat.nb SET TBLPROPERTIES('bloom.columns'='k')")
      rows().coalesce(1).writeTo(s"$cat.nb").append()
      val nbDir = new Path(s"$root/nb")
      val withOffsets = fs.listStatus(nbDir).map(_.getPath)
        .filter(_.getName.startsWith("part-")).map { p =>
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              p, spark.sessionState.newHadoopConf()))
          try r.getFooter.getBlocks.get(0).getColumns.get(0)
            .getBloomFilterOffset >= 0
          finally r.close()
        }
      assert(withOffsets.count(identity) == 1 && withOffsets.length == 2,
        "exactly the post-ALTER file carries blooms")
      val loaded = spark.sessionState.catalogManager.catalog(cat)
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array.empty, "nb"))
      assert(loaded.properties().get("bloom.columns") == "k")
    } finally {
      prevBlock.fold(hconf.unset("parquet.block.size"))(
        v => hconf.set("parquet.block.size", v))
      prevDict.fold(hconf.unset("parquet.enable.dictionary"))(
        v => hconf.set("parquet.enable.dictionary", v))
    }
  }
}
