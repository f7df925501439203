package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs end-to-end on sf0.001 and the declared
  * oracle key set is consistent (mirrors the driver's t1 smoke). */
class QueriesSmokeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("query names are unique across modules") {
    val names = SparkEntry.modules.flatMap(_.defs.map(_.name))
    assert(names.distinct.size == names.size)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes on sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      df.count() // forces full execution incl. codegen paths
    }
  }
}
