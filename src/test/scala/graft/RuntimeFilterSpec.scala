package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.In
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** DSv2 runtime filtering on the synth connector (SynthSource.scala,
  * `SupportsRuntimeFiltering` — the dynamic-partition-pruning seam,
  * SPARK-35779): a fact scan joined to a selectively-filtered dim
  * receives the dim's key set at runtime and generates ONLY the
  * surviving ids. Gotcha pinned here: the dim must not be a
  * LocalRelation — ConvertToLocalRelation folds the selective Filter
  * away before PartitionPruning looks for it, and no DPP is inserted. */
class RuntimeFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("runtime In-filter collapses generation to the surviving ids " +
    "(unit level, row and columnar partitions)") {
    val builder = new SynthSource()
      .getTable(SynthSource.schema, Array.empty,
        new java.util.HashMap[String, String]() {
          put("rows", "100000"); put("partitions", "8")
        })
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
    val scan = builder.build()
    val rf = scan.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
    assert(rf.filterAttributes().map(_.describe()).toSeq == Seq("id"))
    rf.filter(Array[org.apache.spark.sql.sources.Filter](
      In("id", Array[Any](5L, 42L, 99999L, 123456L))))
    val parts = scan.toBatch.planInputPartitions()
    val ids = parts.flatMap {
      case SynthIdsPartition(xs) => xs
      case other => fail(s"expected ids partition, got $other")
    }.sorted.toSeq
    assert(ids == Seq(5L, 42L, 99999L)) // 123456 outside the static range
  }

  test("join to a filtered dim attaches a dynamic pruning filter and the " +
    "scan emits only the matched rows") {
    import spark.implicits._
    val fact = spark.read.format("graft-synth")
      .option("rows", 100000).option("partitions", 8).load()
    // Range-based dim: stays a Filter node for PartitionPruning to see
    val dim = spark.range(100000).select($"id", ($"id" % 9973).as("tag"))
    val joined = fact.join(dim.filter($"tag" === 7), "id")
      .select($"id", $"grp", $"val")
    val rows = joined.collect()
    assert(rows.length == 11) // ids ≡ 7 (mod 9973) in [0, 100000)
    assert(rows.forall(r => r.getLong(0) % 9973 == 7))
    assert(rows.forall(r =>
      r.getString(2) == SynthSource.md5Hex(r.getLong(0).toString)))

    val finalPlan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE hides stage contents behind leaf QueryStageExec nodes — unwrap
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] =
      p.collectWithSubqueries {
        case b: BatchScanExec => Seq(b)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansOf(q.plan)
      }.flatten
    val scans = scansOf(finalPlan)
      .filter(_.toString.contains("graft-synth"))
    assert(scans.nonEmpty, finalPlan.toString)
    assert(scans.exists(_.runtimeFilters.nonEmpty),
      s"no runtime filter attached:\n$finalPlan")
    // the generator produced ONLY the surviving ids, not the whole table
    val scanRows = scans.flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
    assert(scanRows == 11, s"scan emitted $scanRows rows — runtime filter " +
      "not applied to generation")
  }

  test("runtime filter also narrows the columnar read path") {
    import spark.implicits._
    val fact = spark.read.format("graft-synth")
      .option("rows", 100000).option("partitions", 8)
      .option("columnar", true).load()
    val dim = spark.range(100000).select($"id", ($"id" % 9973).as("tag"))
    val joined = fact.join(dim.filter($"tag" === 7), "id")
    assert(joined.count() == 11)
  }
}
