package graft.operators

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}

/** The reference paper's benchmark workloads (BASELINE.md): HiBench-style
  * PageRank (GraphX, SURVEY.md §2.11), K-means (spark.ml, §2.12/HiBench),
  * and a SparkPi-style compute kernel. PageRank/K-means involve
  * float accumulation across partitions → rows-only checks + spec
  * invariants; the Pi estimate uses a deterministic low-discrepancy
  * sequence so it IS oracle-checkable (identical IEEE arithmetic in SQL).
  */
object Workloads extends QueryModule {

  /** PageRank over the customer-nation → supplier-nation trade graph. */
  val qPageRank: QueryDef = QueryDef(
    "q95_graph_pagerank",
    (s, d) => {
      import s.implicits._
      val li = Tables.df(s, d, "lineitem").select($"l_orderkey", $"l_suppkey")
      val ord = Tables.df(s, d, "orders").select($"o_orderkey", $"o_custkey")
      val cust = Tables.df(s, d, "customer").select($"c_custkey", $"c_nationkey")
      val supp = Tables.df(s, d, "supplier").select($"s_suppkey", $"s_nationkey")
      val edgesDf = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
        .groupBy($"c_nationkey", $"s_nationkey").agg(count(lit(1)).as("w"))
      val edges = edgesDf.select($"c_nationkey".cast("long"), $"s_nationkey".cast("long"))
        .as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, 1.0) }
      val ranks = Graph.fromEdges(edges, 1.0).staticPageRank(10).vertices
      s.createDataFrame(ranks.map { case (id, r) =>
        (id, math.round(r * 10000.0) / 10000.0)
      }).toDF("nationkey", "rank")
        .orderBy($"rank".desc, $"nationkey")
    },
    None)

  /** K-means on the embedding corpus (fixed seed, k=8). */
  val qKMeans: QueryDef = QueryDef(
    "q96_ml_kmeans",
    (s, d) => {
      import s.implicits._
      val vecs = Tables.df(s, d, "embeddings")
        .select($"vec_id", $"embedding")
        .as[(Long, Array[Float])]
        .map { case (id, e) => (id, Vectors.dense(e.map(_.toDouble))) }
        .toDF("vec_id", "features")
      val model = new KMeans().setK(8).setSeed(42L).setMaxIter(5).fit(vecs)
      model.transform(vecs)
        .groupBy($"prediction").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"prediction")
    },
    None)

  /** SparkPi with a deterministic low-discrepancy point set (golden-ratio
    * and √2 rotations) instead of RNG — distributed compute with an exact
    * SQL oracle. All arithmetic is forced to DOUBLE on both sides: a bare
    * `0.618…` literal parses as DECIMAL in Spark AND DuckDB, and
    * decimal(38,15) multiply/floor over 1M rows is ~10× slower than the
    * codegen'd double path (measured 3.5 s → 0.3 s at bench shape) while
    * IEEE-754 doubles are bit-identical across both engines. */
  val qPi: QueryDef = QueryDef(
    "q97_compute_pi",
    (s, _) => {
      s.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS inside,
          round(4.0D * COUNT(*) / 1000000, 6) AS pi_est
        FROM (
          SELECT id,
            CAST(id AS DOUBLE) * 0.6180339887498949D
              - floor(CAST(id AS DOUBLE) * 0.6180339887498949D) AS x,
            CAST(id AS DOUBLE) * 0.41421356237309515D
              - floor(CAST(id AS DOUBLE) * 0.41421356237309515D) AS y
          FROM range(0, 1000000))
        WHERE x * x + y * y < 1.0D""")
    },
    Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS inside,
        round(CAST(4.0 AS DOUBLE) * COUNT(*) / 1000000, 6) AS pi_est
      FROM (
        SELECT id,
          CAST(id AS DOUBLE) * CAST(0.6180339887498949 AS DOUBLE)
            - floor(CAST(id AS DOUBLE) * CAST(0.6180339887498949 AS DOUBLE)) AS x,
          CAST(id AS DOUBLE) * CAST(0.41421356237309515 AS DOUBLE)
            - floor(CAST(id AS DOUBLE) * CAST(0.41421356237309515 AS DOUBLE)) AS y
        FROM range(0, 1000000) t(id))
      WHERE x * x + y * y < CAST(1.0 AS DOUBLE)"""))

  override def defs: Seq[QueryDef] = Seq(qPageRank, qKMeans, qPi)
}
