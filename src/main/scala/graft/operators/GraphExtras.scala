package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}

/** GraphX surface beyond PageRank/CC (SURVEY §2.11 — reference
  * `graphx/.../GraphOps.scala:452 triangleCount`, `Graph.scala:373
  * aggregateMessages`), exercised over a data-derived graph and checked
  * EXACTLY against relational formulations in DuckDB — triangle counting
  * and neighborhood aggregation are integer math, so unlike double-rank
  * PageRank the oracle match is bit-exact with no rounding.
  *
  * Graph: parts co-occurring in the same order ("bought together"), u < v
  * canonical, deduped. Scale shape: edge construction is one self-join of
  * the (order, part) projection grouped per order — at 100 TB the per-order
  * line count is bounded (TPC-H ≤ 7), so pairs = O(|orders| · 21); the
  * GraphX steps shuffle edges by vertex cut, the same cost class as the
  * equivalent relational joins. Co-occurrence graphs with UNBOUNDED group
  * sizes (baskets of thousands) need a per-group cap first — same pattern
  * as the LSH bucket cap in `Graft.minHashCandidates`.
  */
object GraphExtras extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  /** Canonical (u < v) distinct part-co-occurrence edges. */
  private def coEdges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val op = t(s, d, "lineitem").select($"l_orderkey", $"l_partkey").distinct()
    op.as("a").join(op.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_partkey" < $"b.l_partkey")
      .select($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
      .distinct()
  }

  private val edgesSql = """
    op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM op a JOIN op b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)"""

  /** GraphX triangleCount per vertex; oracle enumerates oriented triangles
    * (a<b<c) with a 3-way self-join and credits each corner. */
  val qTriangleCount: QueryDef = QueryDef(
    "q146_triangle_count",
    (s, d) => {
      import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy}
      import s.implicits._
      val edges = coEdges(s, d)
        .as[(Long, Long)].rdd.map { case (u, v) => Edge(u, v, ()) }
      val counts = Graph.fromEdges(edges, ())
        .partitionBy(PartitionStrategy.RandomVertexCut)
        .triangleCount().vertices
      s.createDataFrame(counts).toDF("p_partkey", "n_triangles")
        .select($"p_partkey", $"n_triangles".cast("long").as("n_triangles"))
        .orderBy($"p_partkey")
    },
    Some(s"""
      WITH $edgesSql,
      tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM e e1
                JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      verts AS (SELECT u AS id FROM e UNION SELECT v FROM e),
      pv AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
             UNION ALL SELECT c FROM tri),
      cnt AS (SELECT id, COUNT(*) AS n FROM pv GROUP BY id)
      SELECT verts.id AS p_partkey,
             CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_triangles
      FROM verts LEFT JOIN cnt ON verts.id = cnt.id
      ORDER BY p_partkey"""))

  /** aggregateMessages: per-vertex degree and sum of neighbor part keys in
    * one message pass (undirected ⇒ send both ways). Oracle symmetrizes
    * the edge list and GROUP BYs. */
  val qAggregateMessages: QueryDef = QueryDef(
    "q147_aggregate_messages",
    (s, d) => {
      import org.apache.spark.graphx.{Edge, Graph}
      import s.implicits._
      val edges = coEdges(s, d)
        .as[(Long, Long)].rdd.map { case (u, v) => Edge(u, v, ()) }
      val stats = Graph.fromEdges(edges, ())
        .aggregateMessages[(Long, Long)](
          ctx => {
            ctx.sendToSrc((1L, ctx.dstId))
            ctx.sendToDst((1L, ctx.srcId))
          },
          (m1, m2) => (m1._1 + m2._1, m1._2 + m2._2))
      s.createDataFrame(stats.map { case (id, (deg, nsum)) => (id, deg, nsum) })
        .toDF("p_partkey", "degree", "neighbor_key_sum")
        .orderBy($"p_partkey")
    },
    Some(s"""
      WITH $edgesSql,
      sym AS (SELECT u AS id, v AS nb FROM e
              UNION ALL SELECT v, u FROM e)
      SELECT id AS p_partkey, CAST(COUNT(*) AS BIGINT) AS degree,
             CAST(SUM(nb) AS BIGINT) AS neighbor_key_sum
      FROM sym GROUP BY id ORDER BY p_partkey"""))

  override def defs: Seq[QueryDef] = Seq(qTriangleCount, qAggregateMessages)
}
