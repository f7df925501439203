package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Observation
import org.scalatest.funsuite.AnyFunSuite

/** Map-type higher-order functions (map_concat, transform_keys/values,
  * map_filter, map_zip_with — Spark-specific output shapes, spec-pinned)
  * and the observe() metrics API. */
class MapFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("map higher-order functions") {
    import spark.implicits._
    val r = spark.sql("""
      SELECT
        map_concat(map('a', 1), map('b', 2)) AS mc,
        transform_keys(map('a', 1, 'b', 2), (k, v) -> upper(k)) AS tk,
        transform_values(map('a', 1, 'b', 2), (k, v) -> v * 10) AS tv,
        map_filter(map('a', 1, 'b', 2, 'c', 3), (k, v) -> v % 2 = 1) AS mf,
        map_zip_with(map('a', 1), map('a', 100), (k, v1, v2) -> v1 + v2) AS mz,
        map_entries(map('a', 1))[0] AS me,
        element_at(map_from_arrays(array('x', 'y'), array(7, 8)), 'y') AS mfa
    """).collect()(0)
    assert(r.getAs[Map[String, Int]]("mc") == Map("a" -> 1, "b" -> 2))
    assert(r.getAs[Map[String, Int]]("tk") == Map("A" -> 1, "B" -> 2))
    assert(r.getAs[Map[String, Int]]("tv") == Map("a" -> 10, "b" -> 20))
    assert(r.getAs[Map[String, Int]]("mf") == Map("a" -> 1, "c" -> 3))
    assert(r.getAs[Map[String, Int]]("mz") == Map("a" -> 101))
    assert(r.getStruct(r.fieldIndex("me")).getString(0) == "a")
    assert(r.getInt(r.fieldIndex("mfa")) == 8)
  }

  test("observe() collects custom metrics without a second pass") {
    import spark.implicits._
    val obs = Observation("li_metrics")
    val df = Tables.df(spark, "/root/testdata/sf0.001", "lineitem")
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(when($"l_discount" > 0.05, 1).otherwise(0)).as("high_discount"))
    df.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("rows") == 6000L)
    assert(m("high_discount").asInstanceOf[Long] > 0L)
  }
}
