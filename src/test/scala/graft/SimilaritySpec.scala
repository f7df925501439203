package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** LSH ANN quality vs the brute-force baseline (same data, same queries). */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  test("lsh top-k finds only same-bucket neighbors, with sane scores") {
    val rows = Similarity.qLshTopK.run(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Double]("sim") <= 1.000001))
  }

  test("brute-force top-1 neighbor has the highest score per query") {
    val top = Similarity.qBruteForceTopK.run(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
    top.foreach { case (_, rs) =>
      val sims = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("sim"))
      assert(sims.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }
}
