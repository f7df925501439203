package graft

import org.apache.spark.resource.{ExecutorResourceRequests, ResourceProfileBuilder, TaskResourceRequests}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** End-to-end drive of [[GraftAllocationPolicy]] — the reference's
  * VM→ephemeral policy surface, on stock Spark over the shared-dir
  * shuffle, in four phases:
  *
  *   A. Backlogged elastic stage pinned to the ephemeral profile: the
  *      pool-growth ORDER is ephemeral-only (every executor added in the
  *      window belongs to the ephemeral profile; the default pool never
  *      grows) — `ExecutorAllocationManager.scala:405`'s LAMBDA-first in
  *      modern form.
  *   B. Stage-boundary release: the policy kills the ephemeral
  *      executors; a SECOND pinned stage provisions FRESH ones (disjoint
  *      ids) — so no ephemeral executor is ever offered a second task
  *      set (`TaskSetManager.scala:440-452`'s executeOneTask).
  *   C. Fallback: a job pinned to an UNSATISFIABLE profile (more memory
  *      than any worker has — the analogue of a failed Lambda request)
  *      misses the registration deadline, is cancelled, and re-runs on
  *      the default ("VM") pool with the same result.
  *   D. Zero recompute: after all releases, re-reading the phase-A
  *      shuffle submits exactly ONE stage — the killed executors' map
  *      output survived in the shared root.
  *
  * Run in its own JVM: `AllocationPolicyDemo <sharedRoot>`.
  */
object AllocationPolicyDemo {

  def main(args: Array[String]): Unit = {
    val root = args(0)
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1248]")
      .appName("graft-allocation-policy")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.manager",
        "org.apache.spark.shuffle.graft.SharedDirShuffleManager")
      .config("spark.shuffle.sort.io.plugin.class",
        "org.apache.spark.shuffle.graft.SharedDirShuffleDataIO")
      .config("spark.shuffle.graft.root", root)
      .config("spark.local.dir", s"$root-localdirs")
      .config("spark.executor.extraClassPath",
        System.getProperty("java.class.path"))
      .config("spark.executor.memory", "600m")
      .config("spark.dynamicAllocation.enabled", "true")
      .config("spark.dynamicAllocation.shuffleTracking.enabled", "false")
      .config("spark.dynamicAllocation.minExecutors", "0")
      .config("spark.dynamicAllocation.maxExecutors", "2")
      .config("spark.dynamicAllocation.initialExecutors", "2")
      .config("spark.dynamicAllocation.executorIdleTimeout", "2s")
      .config("spark.dynamicAllocation.schedulerBacklogTimeout", "1s")
      .config("spark.locality.wait", "0s")
      .getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("WARN")

    val stageSubmits = new java.util.concurrent.atomic.AtomicInteger
    sc.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stageSubmits.incrementAndGet()
    })

    val ephemeral = new ResourceProfileBuilder()
      .require(new ExecutorResourceRequests().cores(1).memory("450m"))
      .require(new TaskResourceRequests().cpus(1))
      .build()
    // no worker can host this: the "Lambda request fails" analogue
    val unsatisfiable = new ResourceProfileBuilder()
      .require(new ExecutorResourceRequests().cores(1).memory("8g"))
      .require(new TaskResourceRequests().cpus(1))
      .build()

    val policy = new GraftAllocationPolicy(sc, ephemeral.id,
      registerDeadlineMs = 45000L)
    // fallback phase uses a SHORT deadline so the demo stays fast
    val fallbackPolicy = new GraftAllocationPolicy(sc, unsatisfiable.id,
      registerDeadlineMs = 12000L)

    try {
      var waited = 0
      while (policy.execProfile.size < 2 && waited < 60000) {
        Thread.sleep(200); waited += 200
      }
      val defaultExecsAtStart = policy.execProfile.keySet.toSet

      // --- phase A: ephemeral-first growth for a pinned elastic stage ----
      val pairs = sc.parallelize(1 to 200000, 4).map(i => (i % 1000, i.toLong))
      val combined = pairs.reduceByKey(_ + _)
      val pinned = combined.map(identity).withResources(ephemeral)
      val addedBefore = policy.execProfile.keySet.toSet
      val (r1, fell1) = policy.ephemeralFirst("phaseA",
        pinned.collect(), combined.collect())
      val checksum1 = r1.sortBy(_._1).map { case (k, v) => k * 31L + v }.sum
      Drain.untilStable(policy.taskSetsByExec.size.toLong)
      val addedDuringA = policy.execProfile.keySet.toSet -- addedBefore
      val growthEphemeralOnly = addedDuringA.nonEmpty &&
        addedDuringA.forall(id => policy.execProfile(id) == ephemeral.id)
      println(s"POLICYA_OK checksum=$checksum1 fellBack=$fell1 " +
        s"ephemeralAdded=${addedDuringA.size} " +
        s"growthEphemeralOnly=$growthEphemeralOnly")

      // --- phase B: boundary release + fresh pool for the next stage -----
      val firstPool = policy.ephemeralExecs
      val killed = policy.releaseAtBoundary()
      val removedOk = policy.awaitRemoved(killed)
      val pinned2 = combined.map(identity).withResources(ephemeral)
      val (r2, fell2) = policy.ephemeralFirst("phaseB",
        pinned2.collect(), combined.collect())
      val checksum2 = r2.sortBy(_._1).map { case (k, v) => k * 31L + v }.sum
      Drain.untilStable(policy.taskSetsByExec.size.toLong)
      val secondPool = policy.ephemeralExecs
      println(s"POLICYB_OK checksum=$checksum2 fellBack=$fell2 " +
        s"released=${killed.size} removedOk=$removedOk " +
        s"freshPool=${secondPool.nonEmpty && (secondPool intersect firstPool).isEmpty} " +
        s"oneTaskSetPerEphemeral=${policy.oneTaskSetPerEphemeral}")
      policy.releaseAtBoundary()

      // --- phase C: unsatisfiable pool falls back to the default pool ----
      val pinnedBad = combined.map(identity).withResources(unsatisfiable)
      val (r3, fell3) = fallbackPolicy.ephemeralFirst("phaseC",
        pinnedBad.collect(), combined.collect())
      val checksum3 = r3.sortBy(_._1).map { case (k, v) => k * 31L + v }.sum
      println(s"POLICYC_OK checksum=$checksum3 usedFallback=$fell3 " +
        s"unsatisfiableRegistered=${fallbackPolicy.ephemeralExecs.size}")

      // --- phase D: released executors' shuffle reads with zero recompute
      val before = Drain.untilStable(stageSubmits.get().toLong)
      val r4 = combined.collect()
      val checksum4 = r4.sortBy(_._1).map { case (k, v) => k * 31L + v }.sum
      val resubmitted = Drain.untilStable(stageSubmits.get().toLong) - before
      println(s"POLICYD_OK checksum=$checksum4 stagesSubmitted=$resubmitted")
    } finally spark.stop()
  }
}
