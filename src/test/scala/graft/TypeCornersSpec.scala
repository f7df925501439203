package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Micro-fixtures for type-system corners the star schema doesn't reach
  * (FIXTURES.md §B, mirroring the reference's `SQLTestData.scala:41-309`):
  * decimal aggregation, null propagation, binary ordering, nested types,
  * outer-join asymmetry, and the CountMinSketch/BloomFilter sketches
  * (reference `common/sketch/`). */
class TypeCornersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  test("decimal aggregation keeps exact precision") {
    val df = Seq(BigDecimal("0.1"), BigDecimal("0.2"), BigDecimal("0.3"))
      .toDF("d")
    val sum = df.agg(org.apache.spark.sql.functions.sum("d")).collect()(0)
      .getDecimal(0)
    assert(sum.compareTo(new java.math.BigDecimal("0.6")) == 0)
  }

  test("null propagation: sum ignores nulls, count(*) does not") {
    val df = Seq[(Integer, String)]((1, "a"), (null, "b"), (3, null))
      .toDF("a", "s")
    val r = df.agg(sum($"a"), count(lit(1)), count($"a"), count($"s")).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L &&
      r.getLong(2) == 2L && r.getLong(3) == 2L)
    // null-safe equality
    assert(df.filter($"a" <=> lit(null)).count() == 1)
  }

  test("binary type ordering is unsigned-lexicographic") {
    val df = Seq(Array[Byte](2, 1), Array[Byte](1, 9), Array[Byte](1, 2))
      .toDF("b")
    val sorted = df.orderBy($"b").collect().map(_.getAs[Array[Byte]](0).toList).toList
    assert(sorted == List(List[Byte](1, 2), List[Byte](1, 9), List[Byte](2, 1)))
  }

  test("nested struct/array/map projection and access") {
    val df = Seq((Map(1 -> "a"), (7, "x"), Seq(1, 2, 3), true))
      .toDF("m", "s", "arr", "bool")
    val r = df.select(
      element_at($"m", 1), $"s._1", element_at($"arr", 2), size($"arr"))
      .collect()(0)
    assert(r.getString(0) == "a" && r.getInt(1) == 7 &&
      r.getInt(2) == 2 && r.getInt(3) == 3)
  }

  test("outer join asymmetry (UpperCase/LowerCase fixture)") {
    val lower = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("n", "l")
    val upper = Seq((1, "A"), (2, "B"), (3, "C"), (6, "F")).toDF("un", "ul")
    assert(lower.join(upper, $"n" === $"un", "left_outer").count() == 4)
    assert(lower.join(upper, $"n" === $"un", "right_outer").count() == 4)
    assert(lower.join(upper, $"n" === $"un", "full_outer").count() == 5)
  }

  test("count-min sketch and bloom filter bounds (reference common/sketch)") {
    val li = Tables.df(spark, "/root/testdata/sf0.001", "lineitem")
    val cms = li.stat.countMinSketch("l_suppkey", eps = 0.01,
      confidence = 0.95, seed = 42)
    val exact = li.groupBy("l_suppkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n, "CMS never underestimates")
      assert(est <= n + (0.01 * li.count()).toLong + 1, s"CMS overshoot for $k")
    }
    val bloom = li.stat.bloomFilter("l_orderkey", expectedNumItems = 10000, fpp = 0.01)
    val keys = li.select("l_orderkey").distinct().collect().map(_.getLong(0))
    assert(keys.forall(bloom.mightContain), "bloom filter has no false negatives")
  }
}
