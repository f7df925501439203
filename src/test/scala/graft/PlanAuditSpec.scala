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
    "q240_manifest_embeddings_ann", // q66's scoring shape over the governed table
    "q181_ivf_assign_exact",   // corpus × 8 broadcast centroids by design
    "q97_compute_pi",          // range × 1-row constant
    "q223_epoch_shuffle",      // corpus × 2 broadcast epoch rows (fan-out
                               // bounded by the epoch count, never data²)
    "q225_token_budget_sample" // per-source rows × ONE broadcast totals row
  )

  /** Queries whose CONSTRUCTION runs jobs/side effects (streaming drives a
    * query to completion, sources/sinks write files, DDL mutates catalogs,
    * GraphX/ML/RDD paths run actions eagerly) — each planned end-to-end by
    * its own oracle run instead. EXPLICIT name set, not substrings: a new
    * side-effecting query must be added here consciously, and a pure-batch
    * query can never be exempted by an unlucky name. Every name is
    * asserted to exist so renames can't leave stale exemptions. */
  private val skips = Set(
    // streaming (construction runs the stream to completion)
    "q90_stream_hourly_counts", "q91_stream_dedup_users",
    "q92_stream_stateful_counts", "q135_stream_sliding_window",
    "q152_stream_stream_join", "q158_stream_foreachbatch_upsert",
    "q165_stream_file_sink", "q173_stream_flatmapgroups",
    // write-then-read roundtrips / sinks / DDL
    "q85_source_csv_roundtrip", "q86_source_json_roundtrip",
    "q87_source_orc_roundtrip", "q88_source_text_roundtrip",
    "q89_source_partitioned_pruning", "q102_bucketed_join",
    "q112_jdbc_partitioned_roundtrip", "q137_ctas_insert",
    "q153_ddl_catalog_sweep", "q159_dynamic_partition_overwrite",
    "q163_persistent_catalog", "q198_schema_evolution",
    // manifest time travel: two sink commits at construction; the result
    // is a 1-row × 1-row summary join
    "q218_manifest_time_travel",
    // manifest row-level ops: seed commit + DELETE + MERGE run at
    // construction; the returned plan is a bare snapshot scan
    "q219_manifest_merge_upsert",
    // manifest streaming tail: three commits + a stream driven to
    // completion at construction; result reads a memory sink
    "q220_manifest_stream_tail",
    // eager actions at construction (GraphX/ML/RDD/stat collect/cache)
    "q95_graph_pagerank", "q96_ml_kmeans", "q100_cache_scan",
    "q105_rdd_primitives", "q134_dedup_clusters", "q142_pagerank_exact",
    "q143_cc_fingerprint_exact", "q146_triangle_count",
    "q147_aggregate_messages", "q154_rdd_extras", "q162_dedup_clusters_exact",
    "q164_countmin_sketch", "q172_partition_introspection",
    "q182_corpus_pipeline_e2e",
    // skew bench pair: materialized at construction (localCheckpoint)
    // so the AQE-skew conf toggle is in force during execution; the
    // returned plan is a checkpoint scan, so auditing it is vacuous
    "q193_skew_join_plain", "q194_skew_join_salted",
    // observe(): one real pass at construction; result is a local relation
    "q197_observe_metrics")

  test("no unintended cartesian or nested-loop join in any query plan") {
    val names = SparkEntry.queries.keySet
    val stale = (skips ++ intentional).diff(names)
    assert(stale.isEmpty, s"skip/intentional entries match no query: $stale")

    val audited = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => intentional(n) || skips(n) }
    info(s"audited ${audited.size}/${names.size} query plans; " +
      s"skipped (side-effecting construction): ${skips.toSeq.sorted.mkString(", ")}; " +
      s"intentional cartesian/BNLJ: ${intentional.toSeq.sorted.mkString(", ")}")

    // No catch-all: a query that fails to PLAN fails the audit loudly.
    val offenders = audited.flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
        .filter(plan.contains)
      if (bad.nonEmpty) Some(s"$name: ${bad.mkString(",")}") else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
