package graft

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraphX surface beyond PageRank (SURVEY.md §2.11): aggregateMessages,
  * triangle counting, Pregel-based shortest paths, subgraph/degrees. */
class GraphOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def triangleGraph: Graph[Int, Int] = {
    val sc = spark.sparkContext
    // two triangles sharing vertex 2, plus a pendant vertex
    val edges = sc.parallelize(Seq(
      Edge(0L, 1L, 1), Edge(1L, 2L, 1), Edge(2L, 0L, 1),
      Edge(2L, 3L, 1), Edge(3L, 4L, 1), Edge(4L, 2L, 1),
      Edge(4L, 5L, 1)))
    Graph.fromEdges(edges, 0)
  }

  test("aggregateMessages computes degrees") {
    val degrees = triangleGraph.aggregateMessages[Int](
      ctx => { ctx.sendToSrc(1); ctx.sendToDst(1) }, _ + _)
      .collect().toMap
    assert(degrees(2L) == 4)
    assert(degrees(5L) == 1)
  }

  test("triangleCount finds both triangles") {
    val counts = triangleGraph.partitionBy(
      org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
      .triangleCount().vertices.collect().toMap
    assert(counts(2L) == 2) // shared vertex participates in both
    assert(counts(0L) == 1 && counts(5L) == 0)
  }

  test("pregel shortest paths from vertex 0") {
    val g = triangleGraph.mapVertices((id, _) =>
      if (id == 0L) 0.0 else Double.PositiveInfinity)
    val sp = g.pregel(Double.PositiveInfinity)(
      (_, dist, msg) => math.min(dist, msg),
      t => if (t.srcAttr + 1 < t.dstAttr) Iterator((t.dstId, t.srcAttr + 1)) else Iterator.empty,
      math.min)
    val dists = sp.vertices.collect().toMap
    assert(dists(1L) == 1.0 && dists(2L) == 2.0 && dists(4L) == 4.0 && dists(5L) == 5.0)
  }

  test("subgraph restricts edges and vertices") {
    val sub = triangleGraph.subgraph(epred = _.dstId != 5L)
    assert(sub.edges.count() == 6)
  }
}
