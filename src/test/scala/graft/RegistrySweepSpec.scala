package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins exact outputs for the registry long-tail (Spark-specific formats
  * that have no DuckDB oracle). */
class RegistrySweepSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("registry sweep returns the expected values") {
    val r = graft.functions.RegistrySweep.qSweep.run(spark, "").collect()(0)
    assert(r.getAs[String]("conv_b2_b10") == "4")
    assert(r.getAs[String]("hex255") == "FF")
    assert(new String(r.getAs[Array[Byte]]("unhex4d")) == "M")
    assert(r.getAs[String]("bin5") == "101")
    assert(r.getAs[Long]("fact5") == 120L)
    assert(r.getAs[String]("sdx") == "S162")
    assert(r.getAs[String]("fmt") == "1,234,567.89")
    assert(r.getAs[Double]("br_half_even") == 2.0) // banker's rounding
    assert(r.getAs[Double]("r_half_up") == 3.0)    // HALF_UP
    assert(r.getAs[Double]("hyp") == 5.0)
    assert(math.abs(r.getAs[Double]("deg_pi") - 180.0) < 1e-12)
    assert(r.getAs[Int]("bits7") == 3)
    // sentences() is CAST ... AS STRING in the sweep (hashable output)
    assert(r.getAs[String]("sent") == "[[Spark, runs, fast], [It, scales]]")
    assert(r.getAs[String]("xp") == "x")
    assert(r.getAs[String]("mkeys") == "[k1, k2]")
    assert(r.getAs[String]("s2m") == "{a -> 1, b -> 2}")
    assert(r.getAs[String]("arep") == "[ab, ab, ab]")
    assert(r.getAs[String]("flat") == "[1, 2, 3]")
    assert(r.getAs[Long]("crc") == 2635321133L)
    assert(r.getAs[String]("ty") == "decimal(2,1)")
  }
}
