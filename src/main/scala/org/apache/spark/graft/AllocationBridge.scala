package org.apache.spark.graft

import org.apache.spark.{ExecutorAllocationClient, SparkContext}

/** `private[spark]` SPI access for graft.GraftAllocationPolicy (the same
  * external-plugin convention as ColumnBridge / SharedDirShuffle — the
  * only files placed in `org.apache.spark.*`, each a thin bridge over one
  * non-public seam):
  *
  * `SparkContext.killExecutors` hard-refuses when dynamic allocation is
  * on (`require(executorAllocationManager.isEmpty)`), but the policy's
  * whole point is an ACTIVE stage-boundary release of ephemeral
  * executors while dynamic allocation keeps managing the pools — exactly
  * what the reference fork does to its Lambda executors
  * (`core/.../ExecutorAllocationManager.scala:363-410`; Spark's own
  * allocation manager uses this same client call for its idle kills).
  * `force = true` bypasses the idle bookkeeping; `adjustTargetNumExecutors
  * = false` leaves the target alone so the next backlogged pinned stage
  * re-provisions a FRESH pool.
  */
object AllocationBridge {
  /** Kill `ids` without disabling or fighting dynamic allocation.
    * Returns the ids actually scheduled for death. */
  def killExecutors(sc: SparkContext, ids: Seq[String]): Seq[String] =
    sc.schedulerBackend match {
      case c: ExecutorAllocationClient =>
        c.killExecutors(ids, adjustTargetNumExecutors = false,
          countFailures = false, force = true)
      case _ => Seq.empty
    }
}
