package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in analysis-time guardrails (plans/Guardrails.scala, injected via
  * injectCheckRule): with spark.graft.guard=true, condition-less
  * cross/inner joins and unpartitioned windows are rejected BEFORE any
  * task launches; keyed shapes pass; default is off. */
class GuardrailsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(2)

  private def withGuard[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.guard", on.toString)
    try f finally spark.conf.unset("spark.graft.guard")
  }

  private def dims() = {
    import spark.implicits._
    (Seq(1, 2, 3).toDF("a"), Seq(4, 5).toDF("b"))
  }

  test("guard off (default): cross joins and global windows analyze") {
    val (l, r) = dims()
    assert(l.crossJoin(r).count() == 6)
    import org.apache.spark.sql.expressions.Window
    assert(l.withColumn("rn",
      row_number().over(Window.orderBy(col("a")))).count() == 3)
  }

  test("guard on: condition-less cross join is rejected at analysis") {
    val (l, r) = dims()
    withGuard(true) {
      val e = intercept[AnalysisException](l.crossJoin(r).collect())
      assert(e.getMessage.contains("graft guard"), e.getMessage)
      assert(e.getMessage.contains("join condition"), e.getMessage)
    }
  }

  test("guard on: unpartitioned window is rejected, keyed window passes") {
    import org.apache.spark.sql.expressions.Window
    val (l, _) = dims()
    withGuard(true) {
      val e = intercept[AnalysisException](l.withColumn("rn",
        row_number().over(Window.orderBy(col("a")))).collect())
      assert(e.getMessage.contains("PARTITION BY"), e.getMessage)
      // keyed window is fine
      assert(l.withColumn("rn", row_number()
        .over(Window.partitionBy(col("a")).orderBy(col("a")))).count() == 3)
    }
  }

  test("guard on: equi joins and aggregates are untouched") {
    import spark.implicits._
    withGuard(true) {
      val l = Seq((1, "x"), (2, "y")).toDF("k", "v")
      val r = Seq((1, 10), (2, 20)).toDF("k", "w")
      assert(l.join(r, "k").count() == 2)
      assert(l.groupBy($"k").count().count() == 2)
    }
  }
}
