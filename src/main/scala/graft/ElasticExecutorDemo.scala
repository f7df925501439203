package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorAdded, SparkListenerExecutorRemoved, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** End-to-end proof of SplitServe's ELASTIC half: dynamic allocation over
  * the shared-dir shuffle. The reference's whole point is growing the
  * executor pool with pending work and releasing ephemeral (Lambda)
  * executors at stage boundaries WITHOUT losing their shuffle output
  * (reference `core/.../ExecutorAllocationManager.scala:363-410` — release
  * policy; `scheduler/TaskSetManager.scala:440-452` — Lambda offer rules);
  * the HDFS shuffle layer exists so that release is safe. Round 7 proved
  * the storage half (SharedDirShuffleManager survives a KILLED executor);
  * this demo proves the POLICY half on stock Spark machinery:
  *
  *  1. `spark.dynamicAllocation.enabled=true` with
  *     `shuffleTracking.enabled=false` is accepted ONLY because
  *     `SharedDirDriverComponents.supportsReliableStorage()` is true
  *     (ExecutorAllocationManager.validateSettings consults exactly that
  *     flag) — i.e. the plugin legally replaces the external shuffle
  *     service, the same contract SplitServe's HDFS shuffle claims.
  *  2. After a shuffle-producing job completes and the line goes idle,
  *     the allocation manager releases EVERY executor (minExecutors=0) —
  *     the analogue of releasing Lambdas at a stage boundary.
  *  3. A later job over that same shuffle spawns FRESH executors (the
  *     old ones are gone for good) and submits exactly ONE stage: the
  *     DAGScheduler kept the departed executors' map outputs registered
  *     (supportsReliableStorage again), and the fresh reducers read them
  *     from the shared root — zero map-stage recompute.
  *
  * Run in its own JVM (shuffle manager + dynamic allocation are fixed at
  * SparkContext creation): `ElasticExecutorDemo <sharedRoot>`.
  */
object ElasticExecutorDemo {

  def main(args: Array[String]): Unit = {
    val root = args(0)
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .appName("graft-elastic-shuffle")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.manager",
        "org.apache.spark.shuffle.graft.SharedDirShuffleManager")
      .config("spark.shuffle.sort.io.plugin.class",
        "org.apache.spark.shuffle.graft.SharedDirShuffleDataIO")
      .config("spark.shuffle.graft.root", root)
      .config("spark.local.dir", s"$root-localdirs")
      // real executor JVMs need the build on their classpath
      .config("spark.executor.extraClassPath",
        System.getProperty("java.class.path"))
      // --- the elastic policy under test ---------------------------------
      .config("spark.dynamicAllocation.enabled", "true")
      // legal without an external shuffle service ONLY because the
      // DataIO plugin reports supportsReliableStorage=true
      .config("spark.dynamicAllocation.shuffleTracking.enabled", "false")
      .config("spark.dynamicAllocation.minExecutors", "0")
      .config("spark.dynamicAllocation.maxExecutors", "2")
      .config("spark.dynamicAllocation.initialExecutors", "2")
      .config("spark.dynamicAllocation.executorIdleTimeout", "2s")
      .config("spark.dynamicAllocation.schedulerBacklogTimeout", "1s")
      // reduce-task locality prefs point at departed executors; don't
      // stall on them
      .config("spark.locality.wait", "0s")
      .getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("WARN")

    val stageSubmits = new java.util.concurrent.atomic.AtomicInteger
    val added = TrieMap[String, Boolean]()
    val removed = TrieMap[String, Boolean]()
    sc.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stageSubmits.incrementAndGet()
      override def onExecutorAdded(e: SparkListenerExecutorAdded): Unit =
        added.put(e.executorId, true)
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        removed.put(e.executorId, true)
    })
    def active: Set[String] = added.keySet.toSet -- removed.keySet

    try {
      // --- phase 1: produce a shuffle across the full pool ----------------
      var waited = 0
      while (added.size < 2 && waited < 60000) { Thread.sleep(200); waited += 200 }
      val pairs = sc.parallelize(1 to 200000, 8).map(i => (i % 1000, i.toLong))
      val combined = pairs.reduceByKey(_ + _)
      val r1 = combined.collect().sortBy(_._1)
      val checksum1 = r1.map { case (k, v) => k * 31L + v }.sum
      val phase1Execs = added.keySet.toSet
      println(s"PHASE1_OK checksum=$checksum1 execs=${phase1Execs.size}")

      // --- release: idle line drains the whole pool -----------------------
      // minExecutors=0 + idleTimeout=2s: the allocation manager's release
      // path (the stage-boundary Lambda release in the reference) must
      // remove every executor that produced the shuffle.
      waited = 0
      while (!phase1Execs.subsetOf(removed.keySet.toSet) && waited < 90000) {
        Thread.sleep(200); waited += 200
      }
      println(s"RELEASED removed=${removed.size} active=${active.size}")

      // --- phase 2: reuse the departed executors' shuffle -----------------
      // The collect forces a scale-up from zero; fresh executors (never
      // having held any map output) must serve the reduce from the shared
      // root, and the DAGScheduler must submit ONLY the result stage.
      val before = Drain.untilStable(stageSubmits.get().toLong)
      val r2 = combined.collect().sortBy(_._1)
      val checksum2 = r2.map { case (k, v) => k * 31L + v }.sum
      val resubmitted = Drain.untilStable(stageSubmits.get().toLong) - before
      val fresh = added.keySet.toSet -- phase1Execs
      println(s"PHASE2_OK checksum=$checksum2 stagesSubmitted=$resubmitted " +
        s"freshExecutors=${fresh.size}")
    } finally spark.stop()
  }
}
