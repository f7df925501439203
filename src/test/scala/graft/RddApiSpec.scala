package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** RDD / dataflow primitives (SURVEY.md §2.12) and core-API accessories
  * (broadcast variables, accumulators) exercised with exact assertions. */
class RddApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)
  private lazy val sc = spark.sparkContext

  test("sortBy / zip / distinct / cartesian") {
    val a = sc.parallelize(Seq(3, 1, 2, 3), 2)
    assert(a.distinct().sortBy(identity).collect().toSeq == Seq(1, 2, 3))
    val z = sc.parallelize(Seq(10, 20, 30), 3)
      .zip(sc.parallelize(Seq("a", "b", "c"), 3)).collect().toSeq
    assert(z == Seq((10, "a"), (20, "b"), (30, "c")))
    assert(sc.parallelize(Seq(1, 2)).cartesian(sc.parallelize(Seq("x", "y")))
      .count() == 4)
  }

  test("aggregateByKey / cogroup / treeAggregate") {
    val pairs = sc.parallelize(Seq(("a", 1), ("a", 2), ("b", 5)), 3)
    val agg = pairs.aggregateByKey((0, 0))(
      (acc, v) => (acc._1 + v, acc._2 + 1),
      (x, y) => (x._1 + y._1, x._2 + y._2)).collect().toMap
    assert(agg("a") == ((3, 2)) && agg("b") == ((5, 1)))

    val other = sc.parallelize(Seq(("a", "x"), ("c", "y")))
    val cg = pairs.cogroup(other).collect().toMap
    assert(cg("a")._1.toSet == Set(1, 2) && cg("a")._2.toSet == Set("x"))
    assert(cg("c")._1.isEmpty && cg("c")._2.toSet == Set("y"))

    val total = sc.parallelize(1 to 1000, 8)
      .treeAggregate(0L)(_ + _, _ + _, depth = 2)
    assert(total == 500500L)
  }

  test("broadcast variables and accumulators") {
    val lookup = sc.broadcast(Map(1 -> "one", 2 -> "two"))
    val acc = sc.longAccumulator("hits")
    val mapped = sc.parallelize(Seq(1, 2, 3), 3).map { i =>
      if (lookup.value.contains(i)) acc.add(1)
      lookup.value.getOrElse(i, "?")
    }.collect().toSeq
    assert(mapped == Seq("one", "two", "?"))
    assert(acc.value == 2L)
  }

  test("describe/summary produce the standard statistic rows") {
    val df = Tables.df(spark, "/root/testdata/sf0.001", "customer")
    val stats = df.describe("c_acctbal").collect()
      .map(_.getString(0)).toSet
    assert(stats == Set("count", "mean", "stddev", "min", "max"))
    val summary = df.select("c_acctbal").summary().collect()
      .map(_.getString(0)).toSet
    assert(summary.contains("25%") && summary.contains("75%"))
  }

  test("foreachBatch sink observes every micro-batch row") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val seen = spark.sparkContext.longAccumulator("rows_seen")
    val q = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.add(batch.count())
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(seen.value == Tables.df(spark, dir, "events").count())
  }
}
