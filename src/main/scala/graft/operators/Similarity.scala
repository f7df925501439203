package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.VectorExpressions._

/** Similarity search over the embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the full corpus, rank per query. At 100 TB the corpus side
  * stays partitioned and never shuffles; only |queries|×k rows leave each
  * partition after the window... which Spark's window would NOT do naively
  * (it shuffles on query_id). So the top-k here groups by query *after* a
  * per-partition candidate cut via the rank window on the broadcast side —
  * for the library's scale path see `q67`, which buckets the corpus with
  * random-hyperplane LSH so each query only scans its bucket (~1/2^planes
  * of the data, recall traded via multi-probe).
  *
  * The cosine is a custom codegen'd Catalyst expression (Kernels.cosineF):
  * one static call per pair, no boxing — measured ~2.7× over the same
  * math as a Scala UDF on 2M 64-dim pairs (graft.MicroBench).
  */
object Similarity extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  /** Brute-force cosine top-3 neighbors for a broadcast query set.
    * Ranks on the 6-dp-rounded score with vec_id tiebreak so ordering is
    * reproducible across engines and runs. */
  val qBruteForceTopK: QueryDef = QueryDef(
    "q66_sim_bruteforce_topk",
    (s, d) => {
      import s.implicits._
      val corpus = t(s, d, "embeddings")
      val queries = corpus.filter($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"sim".desc, $"vec_id")
      corpus.join(broadcast(queries), $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id",
          round(cosine($"q_emb", $"embedding"), 6).as("sim"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"query_id", $"vec_id", $"sim", $"rk")
        .orderBy($"query_id", $"rk")
    },
    Some("""
      SELECT query_id, vec_id, sim, rk FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
          round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS sim,
          row_number() OVER (PARTITION BY q.vec_id
            ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC,
                     c.vec_id) AS rk
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 10)
      WHERE rk <= 3 ORDER BY query_id, rk"""))

  /** The shared CTE chain replaying `lshBucketF(planes = 4, seed = 7)` in
    * DuckDB, ending at CTE `buckets(vec_id, bucket)`. Exactness argument
    * (see DuckSql scaladoc): plane components `2·((mix64(…) >>> 11)·2^-53)−1`
    * are exact doubles, float→double widening is exact, and the dot
    * product folds in index order via `list_reduce`, so every IEEE
    * rounding — and therefore every SIGN, and therefore every bucket —
    * is bit-identical to the JVM kernel. */
  private[graft] val duckLshBuckets: String = s"""
      dims AS (SELECT max(len(embedding)) AS dim FROM embeddings),
      pi AS (SELECT p, i, CAST(7 + p * 1000003 + i AS HUGEINT) AS rin
             FROM (SELECT unnest(range(0, 4)) AS p) pa,
                  (SELECT unnest(range(0, (SELECT dim FROM dims))) AS i) pb),
      ${graft.DuckSql.mix64("px", "pi", "p, i", "rin", "r")},
      plane AS (SELECT p,
          list(2.0 * (CAST(r >> 11 AS DOUBLE) * 1.1102230246251565e-16) - 1.0
               ORDER BY i) AS cs
        FROM px_out GROUP BY p),
      dots AS (
        SELECT e.vec_id, pl.p,
          list_reduce(list_transform(range(1, len(e.embedding) + 1),
            ix -> CAST(e.embedding[ix] AS DOUBLE) * pl.cs[ix]),
            (a, b) -> a + b) AS dot
        FROM embeddings e CROSS JOIN plane pl),
      buckets AS (
        SELECT vec_id,
          CAST(SUM(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS INT) AS bucket
        FROM dots GROUP BY vec_id)"""

  /** The bucket-join + cosine + top-3 tail shared by the q67 and q156
    * oracles; `probelist` is the per-query probe-bucket list. */
  private def duckLshTail(probelist: String): String = s"""
      corpus AS (SELECT e.vec_id AS neighbor_id, e.embedding AS vec, b.bucket
                 FROM embeddings e JOIN buckets b ON b.vec_id = e.vec_id),
      queries AS (
        SELECT e.vec_id AS query_id, e.embedding AS q_vec,
               unnest($probelist) AS bucket
        FROM embeddings e
        JOIN (SELECT vec_id, bucket AS bucket0 FROM buckets) b
          ON b.vec_id = e.vec_id
        WHERE e.vec_id < 10),
      scored AS (
        SELECT q.query_id, c.neighbor_id,
          round(list_cosine_similarity(CAST(q.q_vec AS DOUBLE[]),
                                       CAST(c.vec AS DOUBLE[])), 6) AS sim
        FROM corpus c JOIN queries q ON c.bucket = q.bucket
        WHERE c.neighbor_id <> q.query_id),
      ranked AS (
        SELECT query_id, neighbor_id, sim,
          row_number() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, neighbor_id) AS rk
        FROM scored)
      SELECT query_id, neighbor_id, sim FROM ranked WHERE rk <= 3
      ORDER BY query_id, sim DESC, neighbor_id"""

  /** ANN scale path: random-hyperplane LSH buckets (custom expression).
    * Corpus is hashed once (map-side); each query joins only its bucket —
    * the join key is the bucket id, so the shuffle moves each corpus row
    * once regardless of query count.
    *
    * Oracle-checked since round 10: the hyperplane components and
    * dot-product signs are EXACT doubles on both engines (see
    * duckLshBuckets), so DuckDB replays the whole bucket→join→cosine→
    * top-k pipeline and hash-matches it — the ANN scale path is no
    * longer rows-only. The spec additionally checks recall vs the q66
    * brute-force truth. */
  val qLshTopK: QueryDef = QueryDef(
    "q67_sim_lsh_topk",
    (s, d) => {
      import s.implicits._
      val corpus = t(s, d, "embeddings")
      graft.api.Graft.lshNeighbors(
        corpus, corpus.filter($"vec_id" < 10),
        idCol = "vec_id", vecCol = "embedding",
        queryIdCol = "vec_id", queryVecCol = "embedding",
        k = 3, planes = 4, seed = 7L)
        .orderBy($"query_id", $"sim".desc, $"neighbor_id")
    },
    Some(s"""
      WITH $duckLshBuckets,
      ${duckLshTail("[bucket0]")}"""))

  /** IVF-style coarse quantization: centroids = per-LSH-cell mean vector
    * (computed with a distributed array aggregate — posexplode + avg, no
    * driver collect), then each vector reports its cell's population and
    * its distance to the centroid. Demonstrates the train/assign halves of
    * an IVF index as pure dataflow. */
  val qIvfCells: QueryDef = QueryDef(
    "q68_sim_ivf_cells",
    (s, d) => {
      import s.implicits._
      val corpus = t(s, d, "embeddings")
        .select($"vec_id", $"embedding", lshBucket($"embedding", 3, 11L).as("cell"))
      val centroids = corpus
        .select($"cell", posexplode($"embedding"))
        .groupBy($"cell", $"pos").agg(avg($"col").as("c"))
        .groupBy($"cell").agg(
          array_sort(collect_list(struct($"pos", $"c"))).as("pairs"))
        .select($"cell", transform($"pairs", p => p.getField("c").cast("float")).as("centroid"))
      corpus.join(broadcast(centroids), Seq("cell"))
        .select($"cell", $"vec_id", round(cosine($"embedding", $"centroid"), 6).as("to_centroid"))
        .groupBy($"cell")
        .agg(count(lit(1)).as("n_vecs"), round(avg($"to_centroid"), 6).as("avg_sim"))
        .orderBy($"cell")
    },
    None)

  /** Same semantics as q66 but through the engine's custom distributed
    * top-k operator (graft.plans.TopKPerKey: partial per-partition heaps →
    * hash-cluster exchange → final merge). Hash-matches the same DuckDB
    * oracle as the window formulation — a correctness proof for the custom
    * physical operator. */
  val qCustomTopK: QueryDef = QueryDef(
    "q69_sim_custom_topk",
    (s, d) => {
      import s.implicits._
      val corpus = t(s, d, "embeddings")
      graft.api.Graft.topKNeighbors(
        corpus, corpus.filter($"vec_id" < 10),
        idCol = "vec_id", vecCol = "embedding",
        queryIdCol = "vec_id", queryVecCol = "embedding", k = 3)
        .withColumnRenamed("neighbor_id", "vec_id")
        .orderBy($"query_id", $"sim".desc, $"vec_id")
    },
    Some("""
      SELECT query_id, vec_id, sim FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
          round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS sim,
          row_number() OVER (PARTITION BY q.vec_id
            ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC,
                     c.vec_id) AS rk
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 10)
      WHERE rk <= 3 ORDER BY query_id, sim DESC, vec_id"""))

  /** Multi-probe variant of q67: same planes/seed, but each query also
    * probes every Hamming-1 neighbor bucket — one corpus scan and one
    * shuffle, recall of ~2^probes hash tables (spec asserts recall ≥ the
    * single-probe run against the q66 brute-force truth). Oracle-checked
    * since round 10 (same exact-double replay as q67; the probe set is
    * bucket0 plus its four Hamming-1 neighbors). */
  val qMultiProbeTopK: QueryDef = QueryDef(
    "q156_sim_multiprobe_topk",
    (s, d) => {
      import s.implicits._
      val corpus = t(s, d, "embeddings")
      graft.api.Graft.lshNeighbors(
        corpus, corpus.filter($"vec_id" < 10),
        idCol = "vec_id", vecCol = "embedding",
        queryIdCol = "vec_id", queryVecCol = "embedding",
        k = 3, planes = 4, seed = 7L, probes = 4)
        .orderBy($"query_id", $"sim".desc, $"neighbor_id")
    },
    Some(s"""
      WITH $duckLshBuckets,
      ${duckLshTail("[bucket0, xor(bucket0, 1), xor(bucket0, 2), " +
        "xor(bucket0, 4), xor(bucket0, 8)]")}"""))

  /** IVF assignment hash-verified: with fixed seed centroids (the first
    * 8 corpus vectors — kmeans++-style seeding picks real points too) the
    * nearest-centroid assignment is plain relational algebra, so DuckDB
    * can replay it exactly — converting the assign half of q68 from
    * rows-only to oracle-checked. Shape: corpus × broadcast(8 centroids)
    * → per-vector argmax by (sim, -cell) via one window over 8·N rows —
    * map-side fan-out, one shuffle on vec_id. Ties break to the lower
    * cell id on both engines. */
  val qIvfAssignExact: QueryDef = QueryDef(
    "q181_ivf_assign_exact",
    (s, d) => {
      import s.implicits._
      val corpus = t(s, d, "embeddings")
      val cents = corpus.filter($"vec_id" < 8)
        .select($"vec_id".as("cell"), $"embedding".as("centroid"))
      val scored = corpus.filter($"vec_id" >= 8)
        .crossJoin(broadcast(cents))
        .select($"vec_id", $"cell",
          round(cosine($"embedding", $"centroid"), 6).as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"vec_id").orderBy($"sim".desc, $"cell".asc)
      scored.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .groupBy($"cell")
        .agg(count(lit(1)).as("n_vecs"),
          round(graft.functions.Exact.dsum($"sim", 9) / count(lit(1)), 6)
            .as("avg_sim"))
        .orderBy($"cell")
    },
    Some("""
      WITH cents AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS c
                     FROM embeddings WHERE vec_id < 8),
      scored AS (
        SELECT e.vec_id, cents.cell,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            cents.c), 6) AS sim
        FROM embeddings e CROSS JOIN cents WHERE e.vec_id >= 8),
      best AS (
        SELECT vec_id, cell, sim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell ASC) AS rn
        FROM scored)
      SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             round(CAST(SUM(CAST(sim AS DECIMAL(18,9))) AS DOUBLE)
                   / COUNT(*), 6) AS avg_sim
      FROM best WHERE rn = 1 GROUP BY cell ORDER BY cell"""))

  override def defs: Seq[QueryDef] =
    Seq(qBruteForceTopK, qLshTopK, qIvfCells, qCustomTopK, qMultiProbeTopK,
      qIvfAssignExact)
}
