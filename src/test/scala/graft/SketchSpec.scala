package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CountMinSketch error-bound contract (q164's spec side): estimates are
  * one-sided (est >= exact always) and over-estimation stays within
  * eps·N with the configured confidence. Checked over every key, not a
  * sample, so the delta-probability slack is the only tolerance. */
class SketchSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  test("countMinSketch estimates bound the exact counts") {
    import spark.implicits._
    val eps = 0.001
    val keys = Tables.df(spark, dir, "lineitem")
      .select($"l_suppkey".cast("long").as("k"))
    val n = keys.count()
    val cms = keys.stat.countMinSketch("k", eps = eps, confidence = 0.99,
      seed = 42)
    assert(cms.totalCount() == n)
    val exact = keys.groupBy($"k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    var overBudget = 0
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS must never under-count: key $k est $est < $c")
      if (est > c + (eps * n).ceil.toLong) overBudget += 1
    }
    // 1% of keys may exceed the eps bound at confidence 0.99; allow 5%
    // slack for the small key population.
    assert(overBudget <= math.max(1, exact.length / 20),
      s"$overBudget of ${exact.length} keys exceeded the eps bound")
  }

  test("q164 output columns carry the bound visibly") {
    val rows = graft.operators.ScalePatterns.qCountMin.run(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("exact_n"))
    }
  }
}
