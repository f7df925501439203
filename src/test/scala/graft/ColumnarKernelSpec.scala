package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ColumnarKernelProjectExec

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
    val kernels = plan.collect { case k: ColumnarKernelProjectExec => k }
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
    assert(plan.collect { case k: ColumnarKernelProjectExec => k }.isEmpty,
      plan.toString)
    // a row child (columnar off) is never claimed either
    val rowPlan = project(columnar = false).queryExecution.executedPlan
    assert(rowPlan.collect { case k: ColumnarKernelProjectExec => k }.isEmpty,
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

  // ---- round 10: the cosine (ANN scoring) kernel over array<float> ----

  import graft.functions.VectorExpressions.cosine
  import graft.plans.ColumnarKernelProjectExec

  private val embPath = "/root/testdata/sf0.001/embeddings.parquet"

  private def queryVec(dim: Int): Array[Float] =
    Array.tabulate(dim)(i => math.sin(i + 1).toFloat)

  /** The ANN brute-force scoring shape: every corpus vector against one
    * literal query vector. */
  private def scored() = {
    import spark.implicits._
    val emb = spark.read.parquet(embPath)
    val dim = emb.select(org.apache.spark.sql.functions.size($"embedding"))
      .head.getInt(0)
    emb.select($"vec_id",
      cosine($"embedding", org.apache.spark.sql.functions.typedlit(queryVec(dim)))
        .as("sim"))
  }

  test("cosine-vs-literal-query over the vectorized parquet scan becomes " +
    "the batch kernel and is bit-identical to the row path") {
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
    spark.conf.set("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
    try {
      val kernelPlan = scored().queryExecution.executedPlan
      assert(kernelPlan.collect { case k: ColumnarKernelProjectExec => k }.nonEmpty,
        kernelPlan.toString)
      val viaKernel = scored().collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
      // row path: same projection, same Kernels.cosineF, via codegen over
      // the non-vectorized reader
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
      val rowPlan = scored().queryExecution.executedPlan
      assert(rowPlan.collect { case k: ColumnarKernelProjectExec => k }.isEmpty,
        rowPlan.toString)
      val viaRows = scored().collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
      assert(viaKernel.length == viaRows.length && viaKernel.length > 0)
      viaKernel.zip(viaRows).foreach { case ((ka, kv), (ra, rv)) =>
        assert(ka == ra)
        assert(java.lang.Double.doubleToRawLongBits(kv) ==
          java.lang.Double.doubleToRawLongBits(rv),
          s"vec $ka: kernel=$kv row=$rv (not bit-equal)")
      }
    } finally {
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
    }
  }

  test("pairwise cosine over two array columns is claimed and bit-equal") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cospair").toString
    spark.read.parquet(embPath)
      .select($"vec_id", $"embedding".as("emb_a"),
        org.apache.spark.sql.functions.reverse($"embedding").as("emb_b"))
      .write.mode("overwrite").parquet(dir)
    def pairScore() = spark.read.parquet(dir)
      .select($"vec_id", cosine($"emb_a", $"emb_b").as("sim"))
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
    try {
      val plan = pairScore().queryExecution.executedPlan
      assert(plan.collect { case k: ColumnarKernelProjectExec => k }.nonEmpty,
        plan.toString)
      val viaKernel = pairScore().collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
      val viaRows = pairScore().collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
      assert(viaKernel.length == viaRows.length && viaKernel.length > 0)
      viaKernel.zip(viaRows).foreach { case ((ka, kv), (ra, rv)) =>
        assert(ka == ra && java.lang.Double.doubleToRawLongBits(kv) ==
          java.lang.Double.doubleToRawLongBits(rv))
      }
    } finally {
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
    }
  }

  test("the kill-switch conf keeps the stock plan") {
    spark.conf.set("spark.graft.columnar.enabled", "false")
    try {
      val plan = scored().queryExecution.executedPlan
      assert(plan.collect { case k: ColumnarKernelProjectExec => k }.isEmpty,
        plan.toString)
    } finally spark.conf.set("spark.graft.columnar.enabled", "true")
  }
}
