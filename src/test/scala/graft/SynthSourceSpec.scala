package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SynthSource

/** SynthSource (custom DataSource V2) pushdown contract: id-range
  * filters narrow the generation window inside the source, unused
  * columns are never materialized, and partition planning splits the
  * narrowed range — the three properties that make a DSv2 connector
  * scale-correct. */
class SynthSourceSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  private def load() = spark.read.format("graft-synth")
    .option("rows", 10000).option("partitions", 4).load()

  test("id-range filters are pushed into the source") {
    import spark.implicits._
    val df = load().filter($"id" >= 100 && $"id" < 250).select($"id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-synth [100, 250)"), plan.take(600))
    assert(df.count() == 150)
  }

  test("column pruning reaches the source") {
    import spark.implicits._
    val df = load().select($"grp")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=grp"), plan.take(600))
    assert(df.distinct().count() == 100)
  }

  test("values match the declared generator") {
    import spark.implicits._
    val row = load().filter($"id" === 4242).collect().head
    assert(row.getLong(0) == 4242 && row.getLong(1) == 42)
    assert(row.getString(2) == SynthSource.md5Hex("4242"))
  }

  test("non-id filters stay in Spark and still apply") {
    import spark.implicits._
    val df = load().filter($"grp" === 7 && $"id" < 1000)
    assert(df.count() == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-synth [0, 1000)"), plan.take(600))
  }

  private def loadColumnar() = spark.read.format("graft-synth")
    .option("rows", 10000).option("partitions", 4)
    .option("columnar", true).load()

  test("columnar mode reports a columnar scan and inserts ColumnarToRow") {
    import spark.implicits._
    val df = loadColumnar().filter($"id" < 9000)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), plan.take(800))
    assert(plan.contains("columnar"), plan.take(800))
    val rowPlan = load().queryExecution.executedPlan.toString
    assert(!rowPlan.contains("ColumnarToRow"), rowPlan.take(800))
  }

  test("columnar and row paths return identical data, pushdown intact") {
    import spark.implicits._
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.filter($"id" >= 123 && $"id" < 8765).groupBy($"grp")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.min($"val").as("m"))
        .orderBy($"grp").collect().toSeq
    assert(agg(loadColumnar()) == agg(load()))
    // the pushed range still narrows the columnar generator
    val plan = loadColumnar().filter($"id" >= 123 && $"id" < 8765)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-synth [123, 8765)"), plan.take(800))
  }

  test("scan reports post-pushdown statistics; a small synth dim gets " +
    "broadcast without a hint") {
    import spark.implicits._
    // pruned + filtered: 150 rows × (8+8) bytes — far under the threshold
    val small = load().filter($"id" >= 100 && $"id" < 250).select($"id", $"grp")
    val stats = small.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.forall(_.toLong == 150L) &&
      stats.sizeInBytes.toLong <= 150L * 48,
      s"stats not reported: $stats")
    val fact = spark.range(100000).select($"id", ($"id" % 7).as("x"))
    val joined = fact.join(small, "id")
    assert(joined.count() == 150)
    assert(joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      joined.queryExecution.executedPlan.toString.take(800))
  }

  test("columnar batches are bounded (capacity 4096) and cover every row " +
    "exactly once across partition boundaries") {
    import spark.implicits._
    // 10000 rows / 4 partitions = 2500 per split < capacity: one batch
    // per split; then force multi-batch splits with partitions=1
    val one = spark.read.format("graft-synth")
      .option("rows", 10000).option("partitions", 1)
      .option("columnar", true).load()
    assert(one.count() == 10000)
    assert(one.select($"id").distinct().count() == 10000)
    assert(one.agg(org.apache.spark.sql.functions.sum($"id")).head.getLong(0)
      == (0L until 10000L).sum)
  }
}
