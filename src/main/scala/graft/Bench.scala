package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline query set on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * Queries execute through the `noop` sink so the FULL physical plan runs
  * (a bare `.count()` lets Catalyst prune every column and skip the
  * project/compute work being measured). Each query gets its own untimed
  * warmup run (codegen compile + parquet footer caches), then the MIN of
  * 3 timed runs is reported — a single timed run is swamped by JIT/GC/
  * co-located-load noise on sub-2 s queries (round-6 BENCH showed phantom
  * 3× regressions that vanished on an idle rerun), and because timing
  * noise is strictly additive the minimum is the stablest estimator of
  * the true plan cost (median-of-3 still let one 0.6 s query wobble 3×
  * when two of three runs caught a GC pause). Spark's own `benchmark/`
  * suites use the same warmup+multi-run discipline.
  */
object Bench {

  /** Headline set: scan-agg, joins (incl. the 5-way TPC-H shapes),
    * windows, explode, dedup (exact + MinHash/SimHash LSH), similarity
    * (brute force + LSH), text stats, temporal joins, streaming, and the
    * compute kernel — the shapes BASELINE.md grades. The heavy multi-join
    * and temporal plans are here so a planner regression surfaces in the
    * BENCH totals (the way q123/q127 did in round 3). */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q03_shipping_priority", "q05_local_supplier_volume",
    "q06_forecast_revenue", "q13_cust_order_distribution", "q22_multi_distinct",
    "q23_cube", "q33_window_rank", "q34_window_running", "q45_lateral_explode",
    "q60_dedup_exact", "q61_dedup_fingerprint", "q63_dedup_minhash_lsh",
    "q64_dedup_simhash", "q66_sim_bruteforce_topk", "q67_sim_lsh_topk",
    "q69_sim_custom_topk", "q70_text_token_stats", "q71_text_token_count",
    "q90_stream_hourly_counts", "q97_compute_pi", "q120_nation_trade_volume",
    "q121_market_share", "q122_product_profit", "q123_returned_items",
    "q127_small_quantity_orders", "q131_sessionize", "q132_funnel",
    "q140_asof_join", "q141_range_join", "q166_trigram_generator",
    "q182_corpus_pipeline_e2e", "q193_skew_join_plain", "q194_skew_join_salted")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = graft.api.Graft.withCacheScope {
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      if (ok) dt else -1.0
    } // scope close (untimed) drops the query's pinned caches

    /** Per-query warmup, then min of 3 timed runs (any failure reports
      * -1, not a statistic over garbage). */
    def measure(name: String): Double = {
      if (runOnce(name) < 0) return -1.0 // warmup (untimed)
      val times = Seq.fill(3)(runOnce(name))
      if (times.exists(_ < 0)) -1.0 else times.min
    }

    val results = headline.map(n => n -> measure(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
