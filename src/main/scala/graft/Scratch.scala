package graft

import org.apache.spark.sql.SparkSession

/** Temporary feature probe (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val d = "/root/testdata/sf0.01"
    Seq("orders", "lineitem", "events", "customer", "nation").foreach { t =>
      Tables.df(spark, d, t).createOrReplaceTempView(t)
    }
    def probe(name: String, sql: String): Unit =
      try {
        spark.sql(sql).show(5, truncate = false)
        println(s"[probe] $name OK")
      } catch { case e: Throwable =>
        println(s"[probe] $name FAIL: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
      }

    probe("rec-spine", """
      WITH RECURSIVE months(m) AS (
        SELECT CAST((SELECT min(date_trunc('month', o_orderdate)) FROM orders) AS DATE)
        UNION ALL
        SELECT m + INTERVAL '1' MONTH FROM months
        WHERE m < (SELECT CAST(max(date_trunc('month', o_orderdate)) AS DATE) FROM orders))
      SELECT date_format(m, 'yyyy-MM') AS month FROM months ORDER BY 1 LIMIT 5""")
    probe("lateral-agg", """
      SELECT l_returnflag AS flag, count(*) AS n, n * 2 AS n2
      FROM lineitem GROUP BY ALL ORDER BY ALL""")
    probe("table-udf", """
      CREATE OR REPLACE TEMPORARY FUNCTION big_orders(cutoff DOUBLE)
      RETURNS TABLE(o_orderkey BIGINT, o_totalprice DOUBLE)
      RETURN SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > cutoff""")
    probe("table-udf-use",
      "SELECT count(*) AS n FROM big_orders(100000.0)")
    probe("variant-agg", """
      SELECT event_type,
        CAST(sum(CAST(variant_get(parse_json(props), '$.k', 'bigint') AS BIGINT)) AS BIGINT) AS ksum
      FROM events GROUP BY ALL ORDER BY ALL""")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    try {
      val wide = Tables.df(spark, d, "customer").groupBy($"c_mktsegment")
        .agg(count(lit(1)).cast("double").as("n_cust"),
          round(avg($"c_acctbal"), 2).as("avg_bal"))
      wide.unpivot(Array($"c_mktsegment"), Array($"n_cust", $"avg_bal"),
        "metric", "value").show(4, truncate = false)
      println("[probe] unpivot-dsl OK")
    } catch { case e: Throwable => println(s"[probe] unpivot-dsl FAIL: ${e.getMessage}") }
    spark.stop()
  }
}
