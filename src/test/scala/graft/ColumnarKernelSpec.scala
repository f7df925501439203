package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ColumnarHammingProjectExec

/** The injectColumnar seam (plans/ColumnarKernel.scala): a hamming64
  * projection over the columnar synth source executes as a batch kernel
  * (no per-row materialization below the single ColumnarToRow), matches
  * the row-path result exactly, and leaves unsupported plans alone. */
class ColumnarKernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def synth(columnar: Boolean) = spark.read.format("graft-synth")
    .option("rows", 20000).option("partitions", 4)
    .option("columnar", columnar).load()

  private def project(columnar: Boolean) = synth(columnar)
    .select(col("id"), col("grp"),
      expr("hamming64(id, grp)").as("hd"))

  test("hamming projection over a columnar child becomes the batch kernel") {
    val plan = project(columnar = true).queryExecution.executedPlan
    val kernels = plan.collect { case k: ColumnarHammingProjectExec => k }
    assert(kernels.nonEmpty, plan.toString)
    // the transition sits ABOVE the kernel: no row project below it
    assert(plan.toString.contains("ColumnarToRow"), plan.toString)
  }

  test("kernel result is bit-identical to the row path") {
    val viaKernel = project(columnar = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    val viaRows = project(columnar = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(viaKernel == viaRows)
    // spot values: id < 100 ⇒ grp == id ⇒ distance 0; id=100 ⇒ h(100,0)=3
    assert(viaKernel.take(3).map(_._3) == Seq(0, 0, 0))
    assert(viaKernel(100)._3 == java.lang.Long.bitCount(100L))
  }

  test("unsupported projections keep the stock plan") {
    // an expression the kernel does not claim (addition)
    val plan = synth(columnar = true)
      .select(col("id"), expr("id + grp").as("s"))
      .queryExecution.executedPlan
    assert(plan.collect { case k: ColumnarHammingProjectExec => k }.isEmpty,
      plan.toString)
    // a row child (columnar off) is never claimed either
    val rowPlan = project(columnar = false).queryExecution.executedPlan
    assert(rowPlan.collect { case k: ColumnarHammingProjectExec => k }.isEmpty,
      rowPlan.toString)
  }

  test("kernel output feeds aggregation correctly (multi-batch)") {
    import spark.implicits._
    val agg = project(columnar = true)
      .groupBy(($"hd" % 2).as("parity")).count()
      .orderBy($"parity").collect().map(r => (r.getInt(0), r.getLong(1)))
    val expected = project(columnar = false)
      .groupBy(($"hd" % 2).as("parity")).count()
      .orderBy($"parity").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(agg.toSeq == expected.toSeq)
  }
}
