package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fleet-wide plan audit: every registered query's physical plan is
  * checked for the two shapes that detonate at scale — CartesianProduct
  * and BroadcastNestedLoopJoin — unless the query is on the explicit
  * allowlist of intentional uses (bounded all-pairs verify stages,
  * deliberate cross joins). A new query that accidentally plans a
  * cartesian (dropped join key, non-equi predicate) fails here instead
  * of in a 100 TB run. Streaming/write queries execute work on plan
  * construction, so the audit covers the batch-planable subset. */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  /** Queries that intentionally use a cartesian/BNLJ shape, each with a
    * documented bound. */
  private val intentional = Set(
    "q16_cross_join",          // deliberate cross of two dims
    "q62_dedup_ngram_jaccard", // bounded id window, all-pairs verify stage
    "q65_dedup_embedding_cosine", // bounded id window
    "q66_sim_bruteforce_topk", // corpus × broadcast queries, guarded
    "q69_sim_custom_topk",     // same scoring shape as q66, custom top-k cut
    "q181_ivf_assign_exact",   // corpus × 8 broadcast centroids by design
    "q97_compute_pi",          // range × 1-row constant
    "q129_theta_join",         // non-equi theta join demo (BNLJ by design)
    "q154_rdd_zip_cartesian"   // RDD cartesian primitive demo
  )

  /** Queries whose construction runs jobs/side effects (streaming,
    * writes, multi-session DDL) — planned end-to-end by their own
    * oracle runs instead. */
  private def skips(n: String): Boolean =
    n.startsWith("q9") && n.contains("stream") ||
      Seq("stream", "sink", "write", "overwrite", "upsert", "catalog",
        "cache", "jdbc", "source", "bucket", "insert", "ctas", "view",
        "ddl", "pagerank", "kmeans", "cluster", "rdd", "describe")
        .exists(n.contains)

  test("no unintended cartesian or nested-loop join in any query plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => intentional(n) || skips(n) }
      .flatMap { case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan.toString
          val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
            .filter(plan.contains)
          if (bad.nonEmpty) Some(s"$name: ${bad.mkString(",")}") else None
        } catch { case _: Throwable => None } // side-effecting query: skip
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
