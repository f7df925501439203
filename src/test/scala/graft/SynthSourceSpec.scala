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
}
