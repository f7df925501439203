package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.resource.{ExecutorResourceRequests, ResourceProfileBuilder, TaskResourceRequests}
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorAdded, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** Stage-level scheduling over the shared-dir shuffle — the modern form
  * of SplitServe's OTHER scheduling rule: the reference doesn't just
  * release Lambdas at stage boundaries, it OFFERS specific stages to the
  * ephemeral pool (`scheduler/TaskSetManager.scala:440-452` gates which
  * executors a task set accepts). Spark's stage-level scheduling is that
  * exact policy seam today: `rdd.withResources(profile)` pins a stage to
  * executors of its ResourceProfile, the TaskSetManager refuses offers
  * from any other profile, and dynamic allocation provisions the pool
  * per profile.
  *
  * The demo pipeline: the MAP stage (shuffle write) runs on the default
  * profile's executors ("VMs"); the RESULT stage (shuffle read) is pinned
  * via `withResources` to a second, smaller profile ("Lambdas"). With a
  * 1-core/1 GiB worker, the Lambda-profile executor can only start after
  * a default executor is released — so the run proves, in order: the
  * default pool produced the shuffle, drained at idle, a fresh
  * Lambda-profile executor spawned, every result task ran ON that
  * profile (listener cross-check of executor→profile vs task→executor),
  * and the reduce read the departed default executors' map output from
  * the shared root. That is SplitServe's VM-writes/Lambda-reads handoff
  * end to end on stock Spark machinery.
  *
  * Run in its own JVM: `StageLevelDemo <sharedRoot>`.
  */
object StageLevelDemo {

  def main(args: Array[String]): Unit = {
    val root = args(0)
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1248]")
      .appName("graft-stage-level")
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
      // stage-level scheduling on standalone requires dynamic allocation;
      // legal without shuffle tracking thanks to supportsReliableStorage
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

    val execProfile = TrieMap[String, Int]()   // executorId -> profileId
    val taskExec = TrieMap[Long, String]()     // taskId -> executorId
    sc.addSparkListener(new SparkListener {
      override def onExecutorAdded(e: SparkListenerExecutorAdded): Unit =
        execProfile.put(e.executorId, e.executorInfo.resourceProfileId)
      override def onTaskStart(t: SparkListenerTaskStart): Unit =
        taskExec.put(t.taskInfo.taskId, t.taskInfo.executorId)
    })

    try {
      var waited = 0
      while (execProfile.size < 2 && waited < 60000) {
        Thread.sleep(200); waited += 200
      }
      // "Lambda pool": smaller executors, own profile id
      val lambda = new ResourceProfileBuilder()
        .require(new ExecutorResourceRequests().cores(1).memory("450m"))
        .require(new TaskResourceRequests().cpus(1))
        .build()

      // map stage on the default ("VM") profile writes the shuffle; the
      // result stage is pinned to the Lambda profile
      val pairs = sc.parallelize(1 to 200000, 4).map(i => (i % 1000, i.toLong))
      val combined = pairs.reduceByKey(_ + _)
      val pinned = combined.map(identity).withResources(lambda)
      val defaultExecs = execProfile.keySet.toSet

      val r = pinned.collect().sortBy(_._1)
      val checksum = r.map { case (k, v) => k * 31L + v }.sum
      Drain.untilStable(taskExec.size.toLong)

      // which executors ran the RESULT stage's tasks? (the pinned map —
      // identity — fuses into the result stage, so its tasks are exactly
      // the post-shuffle ones)
      val resultExecs = taskExec.values.toSet -- defaultExecs
      val resultProfiles = resultExecs.flatMap(execProfile.get)
      val lambdaSpawned = execProfile.collect {
        case (id, p) if p == lambda.id => id
      }.toSet
      println(s"STAGELEVEL_OK checksum=$checksum " +
        s"lambdaProfileId=${lambda.id} " +
        s"lambdaExecutors=${lambdaSpawned.size} " +
        s"resultOnLambdaOnly=${resultProfiles == Set(lambda.id)} " +
        s"defaultExecsReleased=${(defaultExecs intersect resultExecs).isEmpty}")
    } finally spark.stop()
  }
}
