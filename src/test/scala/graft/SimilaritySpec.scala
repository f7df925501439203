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

  test("multi-probe recall >= single-probe recall vs brute-force truth") {
    def topkSet(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) =>
          q -> rs.sortBy(r => (-r.getAs[Double]("sim"),
            r.getAs[Long]("neighbor_id"))).take(3)
            .map(_.getAs[Long]("neighbor_id")).toSet
        }
    val truth = Similarity.qBruteForceTopK.run(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val single = topkSet(Similarity.qLshTopK.run(spark, dir).collect())
    val multi = topkSet(Similarity.qMultiProbeTopK.run(spark, dir).collect())
    def recall(found: Map[Long, Set[Long]]): Double = {
      val hits = truth.map { case (q, t) =>
        (t intersect found.getOrElse(q, Set.empty)).size }.sum
      hits.toDouble / truth.values.map(_.size).sum
    }
    val (rs, rm) = (recall(single), recall(multi))
    assert(rm >= rs, s"multi-probe recall $rm < single-probe $rs")
    assert(rm > 0.0, "multi-probe found nothing")
    // every multi-probe result must be a superset of the single-probe
    // candidates' quality: same scoring, wider candidate set
    assert(multi.keySet.size >= single.keySet.size)
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
