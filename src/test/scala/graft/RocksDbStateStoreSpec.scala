package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** The at-scale state store: q92 (mapGroupsWithState) and q173
  * (flatMapGroupsWithState) re-run with
  * `spark.sql.streaming.stateStore.providerClass` pointing at the RocksDB
  * provider — the store production clusters use for large keyed state
  * (bounded heap: state lives off-JVM-heap in RocksDB with changelog/
  * snapshot files in the checkpoint) — and their results must be
  * row-identical to the default HDFSBackedStateStoreProvider run (the
  * modern analogue of the reference's in-memory+HDFS-snapshot state,
  * reference `streaming/.../state/HDFSBackedStateStoreProvider` lineage).
  * The provider is an execution detail; any visible difference is a bug.
  */
class RocksDbStateStoreSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  private val sfDir = "/root/testdata/sf0.001"
  private val key = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run a streaming QueryDef start-to-finish under the given provider
    * (the conf is read at stream start, which happens inside run()). */
  private def resultUnder(q: QueryDef, provider: Option[String]): Seq[Row] =
    provider match {
      case Some(p) => Confs.withValues(spark, key -> p) {
        q.run(spark, sfDir).collect().toSeq
      }
      case None => q.run(spark, sfDir).collect().toSeq
    }

  for (q <- Seq(StreamingOps.qStateful, StreamingOps.qFlatMapGroups))
    test(s"${q.name}: RocksDB state store result == default provider") {
      val viaRocks = resultUnder(q, Some(rocks))
      val viaDefault = resultUnder(q, None)
      assert(viaRocks.nonEmpty, "stream must produce rows")
      assert(viaRocks == viaDefault,
        s"provider changed visible results: rocks=${viaRocks.take(3)}… " +
          s"default=${viaDefault.take(3)}…")
    }
}
