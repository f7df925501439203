package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.Exact._

/** Iterative graph algorithms expressed as DataFrame loops with
  * order-independent (exact decimal) per-iteration aggregation — so the
  * result is bit-identical regardless of partitioning, AQE re-planning,
  * or cluster size, and can be checked EXACTLY against an independent
  * engine (DuckDB) rather than with tolerances.
  *
  * This complements the GraphX-based q95 (reference workload
  * `graphx/.../lib/PageRank.scala:64` runs Pregel with double ranks whose
  * float accumulation order is partition-dependent): same algorithm, but
  * the engine's deterministic-aggregation discipline (`Exact.dsum`)
  * applied to the message sum makes the fixpoint reproducible. At 100 TB
  * each iteration is one shuffle keyed by dst (message aggregation) plus
  * a broadcast-able join of ranks back to vertices; 5 iterations = 5
  * shuffles, the same cost class as GraphX Pregel.
  */
object IterativeGraph extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  private val iters = 5

  /** Bipartite part↔supplier graph from lineitem (edges both directions,
    * so no dangling nodes): node id = 2·partkey for parts,
    * 2·suppkey+1 for suppliers. */
  private def edgesDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = t(s, d, "lineitem")
      .select($"l_partkey", $"l_suppkey").distinct()
    pairs.select(($"l_partkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .unionByName(
        pairs.select(($"l_suppkey" * 2 + 1).as("src"), ($"l_partkey" * 2).as("dst")))
  }

  /** PageRank (damping 0.85, 5 iterations) over the part↔supplier graph,
    * exact-decimal message sums → DuckDB-exact (oracle = the same five
    * iterations unrolled as CTEs). */
  val qPageRankExact: QueryDef = QueryDef(
    "q142_pagerank_exact",
    (s, d) => {
      import s.implicits._
      val edges = edgesDf(s, d)
      val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
      val nodes = edges.select($"src".as("id")).distinct()
      // One scalar (the node count) crosses the driver: it parameterizes
      // the damping constants, exactly like a config value would.
      val n = nodes.count()
      var ranks = nodes.withColumn("rank", lit(1.0 / n))
      // Lineage truncation: each iteration nests the previous plan, so an
      // unbounded loop would grow the plan (and analysis/codegen time)
      // linearly and re-derive every prior iteration on any recompute.
      // localCheckpoint materializes the ranks and cuts the lineage every
      // few iterations — the template any caller scaling `iters` needs
      // (cf. GraphX Pregel's periodic checkpointing,
      // `graphx/.../Pregel.scala:40`). Values are unchanged.
      val checkpointEvery = 3
      for (i <- 1 to iters) {
        val contribs = edges.join(deg, "src")
          .join(ranks, $"src" === $"id")
          .select($"dst", ($"rank" / $"deg").as("c"))
        ranks = nodes.join(
            contribs.groupBy($"dst").agg(dsum($"c", 12).as("sc")),
            $"id" === $"dst", "left")
          .select($"id",
            (lit(0.15 / n) + lit(0.85) * coalesce($"sc", lit(0.0))).as("rank"))
        if (i % checkpointEvery == 0 && i < iters)
          ranks = ranks.localCheckpoint()
      }
      ranks.orderBy($"id")
    },
    Some {
      // The same five iterations, unrolled (DuckDB's recursive CTEs can't
      // aggregate in the recursive term; for a fixed iteration count the
      // unrolled form is the faithful mirror).
      val prelude = s"""
        WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        edges AS (SELECT l_partkey*2 AS src, l_suppkey*2+1 AS dst FROM pairs
                  UNION ALL
                  SELECT l_suppkey*2+1 AS src, l_partkey*2 AS dst FROM pairs),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        nodes AS (SELECT DISTINCT src AS id FROM edges),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        r0 AS (SELECT id, CAST(1.0 AS DOUBLE)/(SELECT n FROM nn) AS rank
               FROM nodes)"""
      val steps = (1 to iters).map { i =>
        s"""
        r$i AS (
          SELECT nodes.id,
            CAST(0.15 AS DOUBLE)/(SELECT n FROM nn)
              + CAST(0.85 AS DOUBLE)*COALESCE(s.sc, CAST(0.0 AS DOUBLE)) AS rank
          FROM nodes LEFT JOIN (
            SELECT e.dst AS id,
              CAST(SUM(CAST(r.rank/d.deg AS DECIMAL(18,12))) AS DOUBLE) AS sc
            FROM edges e
              JOIN deg d ON e.src = d.src
              JOIN r${i - 1} r ON e.src = r.id
            GROUP BY e.dst) s
          ON nodes.id = s.id)"""
      }.mkString(",")
      s"$prelude,$steps SELECT id, rank FROM r$iters ORDER BY id"
    })

  /** Connected components (DataFrame min-label propagation with pointer
    * jumping — `Graft.dedupClusters`) over
    * prefix-fingerprint duplicate pairs (md5 of the first 40 normalized
    * chars — the kind of cheap blocking key a boilerplate-dedup pass
    * uses). Because a document has exactly one fingerprint, the pair
    * graph is a disjoint union of per-fingerprint cliques — so component
    * = fingerprint group and the oracle can compute the expected clusters
    * with one GROUP BY, independently verifying the CC machinery end to
    * end (canonical = min id). */
  val qCcFingerprint: QueryDef = QueryDef(
    "q143_cc_fingerprint_exact",
    (s, d) => {
      import s.implicits._
      val fps = t(s, d, "documents").select($"doc_id",
        md5(substring(regexp_replace(lower(trim($"text")), " +", " "), 1, 40))
          .as("fp"))
      val pairs = fps.select($"doc_id".as("doc_a"), $"fp")
        .join(fps.select($"doc_id".as("doc_b"), $"fp"), "fp")
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b")
      graft.api.Graft.dedupClusters(pairs)
        .groupBy($"canonical_id")
        .agg(count(lit(1)).as("cluster_size"))
        .orderBy($"canonical_id")
    },
    Some("""
      WITH f AS (SELECT doc_id,
                   md5(substr(regexp_replace(lower(trim(text)), ' +', ' ', 'g'),
                              1, 40)) AS fp
                 FROM documents)
      SELECT MIN(doc_id) AS canonical_id,
             CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM f GROUP BY fp HAVING COUNT(*) >= 2
      ORDER BY canonical_id"""))

  override def defs: Seq[QueryDef] = Seq(qPageRankExact, qCcFingerprint)
}
