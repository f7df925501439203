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
      println(s"EXT_OK cos=$cos ngrams=$grams hamming=$ham topk=$topk strategy=$hasStrategy")
    } finally spark.stop()
  }
}
