package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Nested-struct scan hygiene at the parquet seam: selecting one leaf of
  * a struct must PRUNE the read schema to that leaf (not deserialize the
  * whole struct), and a predicate on a nested leaf must reach
  * PushedFilters. At 100 TB a multimodal/metadata struct column is wide —
  * reading all of it for a one-leaf projection is the difference between
  * a column scan and a table scan. (Catalyst: SchemaPruning +
  * nested-predicate pushdown, both on by default; this spec pins that
  * our stack — GraftSession confs included — keeps them effective.) */
class NestedPruningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectWithSubqueries {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    scans.head
  }

  test("nested leaf projection prunes the parquet read schema; nested " +
    "predicate is pushed") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_nested").toString + "/t"
    // a wide struct column the way a multimodal metadata payload looks
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_id",
        struct($"event_type".as("kind"), $"value".as("score"),
          $"props".as("blob"), $"user_id".as("uid")).as("meta"))
      .write.mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir)
      .filter($"meta.kind" === "click")
      .select($"meta.score")
    val scan = scanOf(q)
    val read = scan.requiredSchema.catalogString
    // only the two touched leaves survive into the scan schema
    assert(read.contains("kind") && read.contains("score"), read)
    assert(!read.contains("blob") && !read.contains("uid"),
      s"struct not pruned — full payload deserialized: $read")
    // the nested predicate reached the parquet pushdown
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("meta.kind"), s"PushedFilters: $pushed")
    // and the result is right
    val expect = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .filter($"event_type" === "click").count()
    assert(q.count() == expect)
  }
}
