package graft.shuffle

import java.io.File
import java.util.Optional
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.SparkConf
import org.apache.spark.shuffle.api._
import org.apache.spark.shuffle.api.metadata.MapOutputCommitMessage
import org.apache.spark.shuffle.sort.io.LocalDiskShuffleDataIO

/** Pluggable shuffle-storage seam (SURVEY §0 item 2 / §4.2): the
  * reference's whole point is swapping WHERE shuffle blocks live — its
  * Lambda executors cannot serve blocks peer-to-peer, so map output goes
  * to a shared HDFS layer (`core/.../shuffle/HDFSShuffleBlockResolver
  * .scala:38`, `storage/HDFSBlockObjectWriter.scala:30`, gated by
  * `spark.shuffle.hdfs.enabled`). The fork patched `BlockManager`
  * directly; modern Spark exposes the same seam as a public plugin API
  * (`ShuffleDataIO`, SPARK-25299 — the mechanism cloud/disaggregated
  * shuffle services build on), so the engine ships one.
  *
  * `GraftShuffleDataIO` interposes on every committed map output and
  * every single-spill transfer, accounting bytes/partitions/commits into
  * process-wide counters, and delegates storage to the local-disk
  * implementation. Replacing the delegate with an object-store/DFS-backed
  * `ShuffleExecutorComponents` — the SplitServe HDFS design — changes no
  * engine code: activation is one conf
  * (`spark.shuffle.sort.io.plugin.class=graft.shuffle.GraftShuffleDataIO`).
  * `supportsReliableStorage` would then return true, letting the driver
  * skip recomputing lost map stages exactly as SplitServe's shared-HDFS
  * shuffle does for released Lambda executors.
  *
  * All three sort-shuffle writer paths cross this seam: bypass-merge and
  * SortShuffleWriter commit through `createMapOutputWriter`, and
  * UnsafeShuffleWriter's one-spill fast path through
  * `createSingleFileMapOutputWriter`.
  */
final class GraftShuffleDataIO(conf: SparkConf) extends ShuffleDataIO {
  private val delegate = new LocalDiskShuffleDataIO(conf)
  override def driver(): ShuffleDriverComponents = delegate.driver()
  override def executor(): ShuffleExecutorComponents =
    new GraftExecutorComponents(delegate.executor())
}

/** Process-wide shuffle accounting (local-mode: driver and executors share
  * the JVM, so tests read these directly; on a cluster the same counters
  * would be surfaced as SparkPlugin metrics). */
object GraftShuffleMetrics {
  val bytesWritten = new LongAdder
  val partitionsWritten = new LongAdder
  val mapOutputsCommitted = new LongAdder
  def reset(): Unit = {
    bytesWritten.reset(); partitionsWritten.reset()
    mapOutputsCommitted.reset()
  }
}

private final class GraftExecutorComponents(d: ShuffleExecutorComponents)
    extends ShuffleExecutorComponents {

  override def initializeExecutor(appId: String, execId: String,
      extraConfigs: java.util.Map[String, String]): Unit =
    d.initializeExecutor(appId, execId, extraConfigs)

  override def createMapOutputWriter(shuffleId: Int, mapTaskId: Long,
      numPartitions: Int): ShuffleMapOutputWriter =
    new GraftMapOutputWriter(
      d.createMapOutputWriter(shuffleId, mapTaskId, numPartitions))

  override def createSingleFileMapOutputWriter(shuffleId: Int,
      mapId: Long): Optional[SingleSpillShuffleMapOutputWriter] = {
    val inner = d.createSingleFileMapOutputWriter(shuffleId, mapId)
    if (inner.isPresent)
      Optional.of(new SingleSpillShuffleMapOutputWriter {
        override def transferMapSpillFile(mapSpillFile: File,
            partitionLengths: Array[Long], checksums: Array[Long]): Unit = {
          inner.get.transferMapSpillFile(mapSpillFile, partitionLengths,
            checksums)
          GraftShuffleMetrics.bytesWritten.add(partitionLengths.sum)
          GraftShuffleMetrics.partitionsWritten.add(
            partitionLengths.count(_ > 0))
          GraftShuffleMetrics.mapOutputsCommitted.increment()
        }
      }: SingleSpillShuffleMapOutputWriter)
    else inner
  }
}

private final class GraftMapOutputWriter(d: ShuffleMapOutputWriter)
    extends ShuffleMapOutputWriter {

  override def getPartitionWriter(reducePartitionId: Int): ShufflePartitionWriter =
    d.getPartitionWriter(reducePartitionId)

  override def commitAllPartitions(checksums: Array[Long]): MapOutputCommitMessage = {
    val msg = d.commitAllPartitions(checksums)
    val lengths = msg.getPartitionLengths
    GraftShuffleMetrics.bytesWritten.add(lengths.sum)
    GraftShuffleMetrics.partitionsWritten.add(lengths.count(_ > 0))
    GraftShuffleMetrics.mapOutputsCommitted.increment()
    msg
  }

  override def abort(error: Throwable): Unit = d.abort(error)
}
