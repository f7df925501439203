package graft

import java.util.concurrent.atomic.AtomicReference

import scala.collection.concurrent.TrieMap

import org.apache.spark.SparkContext
import org.apache.spark.resource.ResourceProfile
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorAdded, SparkListenerExecutorRemoved, SparkListenerTaskStart}

/** The reference's VM→ephemeral allocation POLICY, composed from the
  * pieces the repo already proves (stage-level scheduling over the
  * shared-dir shuffle + dynamic allocation), expressed on stock Spark
  * machinery:
  *
  *   - **Ephemeral first on backlog** — reference
  *     `core/.../ExecutorAllocationManager.scala:363-410` (esp. `:405`)
  *     requests `"LAMBDA"` executors when tasks back up and only falls
  *     back to `"VM"` when that request fails. Modern form: elastic
  *     stages are pinned to the EPHEMERAL resource profile
  *     (`rdd.withResources`), so the allocation manager grows exactly
  *     that pool for the backlog — the default ("VM") pool never grows
  *     for pinned work. [[GraftAllocationPolicy.ephemeralFirst]] adds
  *     the reference's FALLBACK half: if no ephemeral executor registers
  *     within the deadline (pool unsatisfiable — the analogue of the
  *     Lambda request failing), the job is cancelled and re-run on the
  *     default pool.
  *   - **One task set per ephemeral executor, bounded lifetime** —
  *     reference `scheduler/TaskSetManager.scala:440-452` refuses offers
  *     from a `"LAMBDA"` executor that already ran a task set or outlived
  *     `spark.lambda.executor.timeout`, and kills Lambdas at stage
  *     boundaries. Modern form: [[GraftAllocationPolicy.releaseAtBoundary]]
  *     kills every ephemeral executor once the pinned stage completes
  *     (it can then never be OFFERED a second task set — the next pinned
  *     stage provisions fresh ones), and the same call reaps any
  *     ephemeral executor older than `maxLifetimeMs` mid-pipeline.
  *   - **Release is safe** because the shared-dir shuffle plugin reports
  *     `supportsReliableStorage` — a killed executor's map output stays
  *     registered and later stages read it from the shared root with
  *     zero recompute (proven again by the demo's final phase).
  *
  * The policy is a LIBRARY object over public APIs (`withResources`,
  * `killExecutors`, `cancelJobGroup`, listener bus) — the reference needs
  * a scheduler fork for the same behavior; the extension seams make it
  * deployable per-application. Driven end to end by
  * [[AllocationPolicyDemo]] (own JVM) and asserted by
  * AllocationPolicySpec.
  */
class GraftAllocationPolicy(sc: SparkContext, ephemeralProfileId: Int,
    registerDeadlineMs: Long = 60000L, maxLifetimeMs: Long = 600000L) {

  /** executorId → resource profile id. */
  val execProfile = TrieMap[String, Int]()
  /** executorId → registration time (for the lifetime bound). */
  val execAddedAt = TrieMap[String, Long]()
  val execRemoved = TrieMap[String, Boolean]()
  /** executorId → distinct (stageId, attempt) task sets it ran tasks of. */
  val taskSetsByExec = TrieMap[String, Set[(Int, Int)]]()

  sc.addSparkListener(new SparkListener {
    override def onExecutorAdded(e: SparkListenerExecutorAdded): Unit = {
      execProfile.put(e.executorId, e.executorInfo.resourceProfileId)
      execAddedAt.put(e.executorId, System.currentTimeMillis())
    }
    override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
      execRemoved.put(e.executorId, true)
    override def onTaskStart(t: SparkListenerTaskStart): Unit = {
      val key = (t.stageId, t.stageAttemptId)
      taskSetsByExec.updateWith(t.taskInfo.executorId) {
        case Some(s) => Some(s + key)
        case None => Some(Set(key))
      }
    }
  })

  def ephemeralExecs: Set[String] = execProfile.collect {
    case (id, p) if p == ephemeralProfileId && !execRemoved.contains(id) => id
  }.toSet

  /** Every ephemeral executor (live or dead) ran tasks of AT MOST one
    * task set — the observable form of the reference's offer gate. */
  def oneTaskSetPerEphemeral: Boolean = execProfile.forall {
    case (id, p) if p == ephemeralProfileId =>
      taskSetsByExec.getOrElse(id, Set.empty).size <= 1
    case _ => true
  }

  /** Run `pinned` (a job whose elastic stage is pinned to the ephemeral
    * profile). Backlog growth therefore requests EPHEMERAL executors; if
    * none registers within the deadline — the pool cannot be satisfied,
    * the analogue of the reference's failed `"LAMBDA"` request — cancel
    * the job and run `fallback` on the default ("VM") pool. Returns the
    * result and whether the fallback path ran. */
  def ephemeralFirst[T](jobGroup: String, pinned: => T, fallback: => T): (T, Boolean) = {
    val before = ephemeralExecs
    val result = new AtomicReference[Option[Either[Throwable, T]]](None)
    val t = new Thread(() => {
      sc.setJobGroup(jobGroup, "graft ephemeral-first", interruptOnCancel = true)
      try result.set(Some(Right(pinned)))
      catch { case e: Throwable => result.set(Some(Left(e))) }
    }, s"graft-ephemeral-$jobGroup")
    t.setDaemon(true)
    t.start()
    val t0 = System.currentTimeMillis()
    var fellBack = false
    while (result.get().isEmpty && !fellBack) {
      val grew = (ephemeralExecs -- before).nonEmpty
      if (!grew && System.currentTimeMillis() - t0 > registerDeadlineMs) {
        // the ephemeral request "failed": fall back to the default pool
        sc.cancelJobGroup(jobGroup)
        fellBack = true
      } else Thread.sleep(100)
    }
    if (fellBack) {
      t.join(30000)
      (fallback, true)
    } else result.get().get match {
      case Right(v) => (v, false)
      case Left(e) => throw e
    }
  }

  /** Stage-boundary release: kill every live ephemeral executor (and any
    * that outlived `maxLifetimeMs`). The next pinned stage provisions
    * FRESH ephemeral executors, so no ephemeral executor is ever offered
    * a second task set. Safe over the shared-dir shuffle: their map
    * output remains readable. Returns the killed ids. */
  def releaseAtBoundary(): Set[String] = {
    val doomed = ephemeralExecs
    // NOT sc.killExecutors — that API refuses to coexist with dynamic
    // allocation; the bridge issues the DA-compatible force-kill (see
    // org.apache.spark.graft.AllocationBridge)
    if (doomed.nonEmpty)
      org.apache.spark.graft.AllocationBridge.killExecutors(sc, doomed.toSeq)
    doomed
  }

  /** Mid-pipeline lifetime bound (`spark.lambda.executor.timeout`
    * analogue): reap ephemeral executors older than `maxLifetimeMs`
    * without waiting for the stage boundary. */
  def reapOverLifetime(): Set[String] = {
    val now = System.currentTimeMillis()
    val doomed = ephemeralExecs.filter(id =>
      now - execAddedAt.getOrElse(id, now) > maxLifetimeMs)
    if (doomed.nonEmpty)
      org.apache.spark.graft.AllocationBridge.killExecutors(sc, doomed.toSeq)
    doomed
  }

  /** Wait until `ids` have all been removed (post-kill confirmation). */
  def awaitRemoved(ids: Set[String], timeoutMs: Long = 60000L): Boolean = {
    val t0 = System.currentTimeMillis()
    while (!ids.forall(execRemoved.contains) &&
        System.currentTimeMillis() - t0 < timeoutMs) Thread.sleep(100)
    ids.forall(execRemoved.contains)
  }
}
