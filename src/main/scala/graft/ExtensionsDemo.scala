package graft

import org.apache.spark.sql.SparkSession

/** Proves `spark.sql.extensions=graft.GraftExtensions` wires everything
  * from configuration alone (run in a fresh JVM by ExtensionsSpec): SQL
  * reaches the codegen'd kernels and the custom aggregate, and the
  * TopKPerKey strategy is present in the planner without any
  * DSL-side-effect injection. */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master("local[2]")
        .appName("graft-extensions-demo")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.extensions", "graft.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val cos = spark.sql(
        """SELECT round(cosine(CAST(array(1.0, 2.0, 3.0) AS ARRAY<DOUBLE>),
                               CAST(array(1.0, 2.0, 3.0) AS ARRAY<DOUBLE>)), 6) AS c""")
        .collect().head.getDouble(0)
      val grams = spark.sql(
        "SELECT ngram FROM (SELECT ngrams(array('a','b','c','d'), 2) AS ngram)")
        .collect().map(_.getString(0)).mkString("|")
      val ham = spark.sql("SELECT hamming64(7L, 0L) AS h")
        .collect().head.getInt(0)
      val topk = spark.sql("""
        SELECT top_k_labels(CAST(v AS DOUBLE), l, 2) AS ls FROM VALUES
          (3.0, 'c'), (1.0, 'a'), (9.0, 'z'), (5.0, 'e') AS t(v, l)""")
        .collect().head.getSeq[String](0).mkString(",")
      val hasStrategy = spark.sessionState.planner.strategies
        .exists(_.getClass.getName.contains("TopKStrategy"))
      // parser seam: the DEDUP TABLE statement parses and desugars
      spark.sql("SELECT * FROM VALUES (1L, 2), (1L, 1), (2L, 5) AS t(k, v)")
        .createOrReplaceTempView("ext_demo")
      val dedup = spark.sql("DEDUP TABLE ext_demo BY (k) KEEP MIN v")
        .collect().map(r => s"${r.getLong(0)}:${r.getInt(1)}")
        .sorted.mkString(",")
      // columnar seam: hamming over the columnar source runs the kernel
      val colPlan = spark.read.format("graft-synth")
        .option("rows", 100).option("columnar", true).load()
        .selectExpr("hamming64(id, grp) AS h")
      val kernel = colPlan.queryExecution.executedPlan
        .exists(_.getClass.getName.contains("ColumnarKernelProjectExec"))
      val kernelSum = colPlan.agg(org.apache.spark.sql.functions.sum("h"))
        .collect().head.getLong(0)
      println(s"EXT_OK cos=$cos ngrams=$grams hamming=$ham topk=$topk " +
        s"strategy=$hasStrategy dedup=$dedup kernel=$kernel ksum=$kernelSum")
    } finally spark.stop()
  }
}
