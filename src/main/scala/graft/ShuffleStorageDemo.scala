package graft

import java.io.File

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorAdded, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Proof harness for the shared-directory shuffle
  * (org.apache.spark.shuffle.graft.SharedDirShuffleManager — the
  * SplitServe HDFS-shuffle analogue, reference
  * `core/.../shuffle/HDFSShuffleBlockResolver.scala:38`). Run in its own
  * JVM (the shuffle manager is fixed at SparkContext creation, and spec
  * suites share a session): `ShuffleStorageDemo <mode> <sharedRoot>`.
  *
  * mode=local (local[4]): proves
  *  1. shuffle-heavy jobs (RDD reduceByKey map-side combine, sortByKey
  *     ordered read, DataFrame join+agg through the Unsafe writer path)
  *     produce correct results under the manager;
  *  2. map output lands ONLY under the shared root — zero shuffle files
  *     in the executor-local block-manager dirs (storage is redirected,
  *     not copied);
  *  3. a second job over the same shuffle skips the map stage entirely
  *     (reads served from the shared root).
  *
  * mode=cluster (local-cluster[2,1,1024] — real executor JVMs): after the
  * shuffle completes, one executor is killed; the re-run job must skip
  * the map stage (no recompute — DAGScheduler kept the dead executor's
  * map outputs because SharedDirDriverComponents.supportsReliableStorage)
  * and reduce from the shared root, which no longer has a live owner.
  * This is SplitServe's release-the-Lambda-keep-its-shuffle property.
  *
  * mode=fetchfail (local[4]): after the shuffle completes, one committed
  * map DATA file is deleted from the shared root (simulating external
  * cleanup / storage loss). The next job over that shuffle must RECOVER,
  * not abort: the reader surfaces the missing file as
  * FetchFailedException with the tracker-listed address, the DAGScheduler
  * unregisters exactly that map output, resubmits the map stage for it,
  * and the job completes with the correct result — vanilla Spark's fetch
  * recovery contract, over shared storage.
  */
object ShuffleStorageDemo {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val root = args(1)
    val master =
      if (mode == "cluster") "local-cluster[2,1,1024]" else "local[4]"
    val builder = SparkSession.builder()
      .master(master)
      .appName("graft-shared-shuffle")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.manager",
        "org.apache.spark.shuffle.graft.SharedDirShuffleManager")
      .config("spark.shuffle.sort.io.plugin.class",
        "org.apache.spark.shuffle.graft.SharedDirShuffleDataIO")
      .config("spark.shuffle.graft.root", root)
      // dedicated local dirs so the leak scan below sees ONLY this app's
      // block-manager directories
      .config("spark.local.dir", s"$root-localdirs")
    if (mode == "cluster") {
      // real executor JVMs need the build on their classpath
      builder.config("spark.executor.extraClassPath",
        System.getProperty("java.class.path"))
    }
    val spark = builder.getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("WARN")

    val stageSubmits = new java.util.concurrent.atomic.AtomicInteger
    val executors = TrieMap[String, Boolean]()
    val remoteBytes = new java.util.concurrent.atomic.AtomicLong
    val localBytes = new java.util.concurrent.atomic.AtomicLong
    sc.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stageSubmits.incrementAndGet()
      override def onExecutorAdded(e: SparkListenerExecutorAdded): Unit =
        executors.put(e.executorId, true)
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          remoteBytes.addAndGet(t.taskMetrics.shuffleReadMetrics.remoteBytesRead)
          localBytes.addAndGet(t.taskMetrics.shuffleReadMetrics.localBytesRead)
        }
    })

    try {
      // --- workload: RDD combine + sort + SQL join/agg -------------------
      val pairs = sc.parallelize(1 to 200000, 8).map(i => (i % 1000, i.toLong))
      val combined = pairs.reduceByKey(_ + _) // map-side combine path
      val r1 = combined.collect().sortBy(_._1)
      val checksum1 = r1.map { case (k, v) => k * 31L + v }.sum
      val sorted = pairs.sortByKey(ascending = false) // keyOrdering path
      val firstKey = sorted.first()._1
      import spark.implicits._
      val df = spark.range(0, 50000).select(($"id" % 500).as("k"), $"id".as("v"))
      val dim = spark.range(0, 500).select($"id".as("k"), ($"id" * 2).as("w"))
      val sqlSum = df.hint("merge").join(dim, "k")
        .groupBy($"k").agg(org.apache.spark.sql.functions.sum($"v" + $"w").as("s"))
        .agg(org.apache.spark.sql.functions.sum($"s")).head().getLong(0)
      println(s"PHASE1_OK checksum=$checksum1 firstKey=$firstKey sqlSum=$sqlSum")

      // --- storage redirect proof ---------------------------------------
      // layout is <root>/<appId>/shuffle_<id>/...
      val sharedFiles = Option(new File(root).listFiles()).getOrElse(Array.empty)
        .flatMap(a => Option(a.listFiles()).getOrElse(Array.empty))
        .filter(_.getName.startsWith("shuffle_"))
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      val localLeaks = {
        def walk(f: File): Iterator[File] =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).iterator.flatMap(walk)
          else Iterator(f)
        walk(new File(s"$root-localdirs"))
          .count(f => f.getName.startsWith("shuffle_") &&
            (f.getName.endsWith(".data") || f.getName.endsWith(".index")))
      }
      println(s"STORAGE_OK sharedFiles=${sharedFiles.length} localLeaks=$localLeaks")

      // shared-root traffic is remote storage, not executor-local disk —
      // the telemetry must say so (listener sums across phase-1 tasks)
      Drain.untilStable(remoteBytes.get() + localBytes.get())
      println(s"READMETRICS_OK remoteBytes=${remoteBytes.get()} " +
        s"localBytes=${localBytes.get()}")

      if (mode == "local") {
        // --- AQE skew-split reads: map-subrange getReader calls -----------
        // A skew-split AQEShuffleRead asks the reader for a SUBRANGE of
        // map outputs per reduce partition (startMapIndex/endMapIndex) —
        // the one read shape the main workload doesn't hit. Force a split
        // with tight thresholds and cross-check against the broadcast
        // formulation of the same join (no shuffle read at all).
        Confs.withValues(spark,
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768") {
          val skewL = spark.range(0, 400000)
            .select(org.apache.spark.sql.functions.when($"id" % 2 === 0, 0L)
              .otherwise($"id" % 97).as("k"), $"id".as("v"))
          val skewR = spark.range(0, 97)
            .select($"id".as("k"), ($"id" * 3).as("w"))
          val smjDf = skewL.hint("merge").join(skewR, "k")
            .agg(org.apache.spark.sql.functions.sum($"v" * $"w").as("s"))
          // collect(), not head(): head() spawns a separate limited
          // execution, leaving THIS queryExecution's adaptive plan
          // unexecuted (so it would never show the runtime skew rewrite)
          val viaSmj = smjDf.collect()(0).getLong(0)
          val skewSplit = smjDf.queryExecution.executedPlan.toString
            .contains("skew=true")
          val viaBcast = skewL
            .join(org.apache.spark.sql.functions.broadcast(skewR), "k")
            .agg(org.apache.spark.sql.functions.sum($"v" * $"w")).head().getLong(0)
          println(s"SKEWREAD_OK equal=${viaSmj == viaBcast} skewSplit=$skewSplit")
        }
      }

      if (mode == "cluster") {
        // --- executor loss: kill one, keep its shuffle --------------------
        var waited = 0
        while (executors.size < 2 && waited < 60000) {
          Thread.sleep(200); waited += 200
        }
        val victim = executors.keys.head
        sc.killExecutors(Seq(victim))
        Thread.sleep(3000) // let the loss propagate to the DAGScheduler
        println(s"KILLED executor=$victim of ${executors.size}")
        // A FRESH SQL shuffle on the post-loss topology: map output
        // written and read back entirely through the shared root by
        // whatever executors remain (plus any replacement the worker
        // spawns) — the steady-state SplitServe serving shape.
        val sqlSum2 = df.hint("merge").join(dim, "k")
          .groupBy($"k").agg(org.apache.spark.sql.functions.sum($"v" + $"w").as("s"))
          .agg(org.apache.spark.sql.functions.sum($"s")).head().getLong(0)
        println(s"POSTKILL_SQL_OK equal=${sqlSum2 == sqlSum}")
      }

      // --- re-run: map stage must be skipped ----------------------------
      // A collect over the already-shuffled RDD submits exactly ONE stage
      // (the result stage) when the map output survived; a recompute
      // would submit two. The async listener bus is drained by polling
      // before reading the counter.
      val before = Drain.untilStable(stageSubmits.get().toLong)
      val r2 = combined.collect().sortBy(_._1)
      val checksum2 = r2.map { case (k, v) => k * 31L + v }.sum
      val resubmitted = Drain.untilStable(stageSubmits.get().toLong) - before
      println(s"PHASE2_OK checksum=$checksum2 stagesSubmitted=$resubmitted")

      if (mode == "local") {
        // --- checksum audit: clean pass, then detect a flipped byte ------
        // spark.shuffle.checksum.enabled is on by default, so every
        // committed map output has a .checksum companion; the audit
        // recomputes each segment and must (a) pass clean, (b) name
        // exactly the segment a single flipped byte lands in.
        import org.apache.spark.shuffle.graft.SharedDirShuffleAudit
        val appDir = new File(root).listFiles().head
        val (segs, bad) = SharedDirShuffleAudit.verify(appDir)
        val victim = appDir.listFiles()
          .filter(_.getName.startsWith("shuffle_"))
          .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
          .filter(f => f.getName.endsWith(".data") && f.length() > 0)
          .maxBy(_.length())
        val raf = new java.io.RandomAccessFile(victim, "rw")
        try {
          raf.seek(victim.length() / 2)
          val b = raf.read()
          raf.seek(victim.length() / 2)
          raf.write(b ^ 0xFF)
        } finally raf.close()
        val (_, badAfter) = SharedDirShuffleAudit.verify(appDir)
        println(s"AUDIT_OK segments=$segs corruptBefore=${bad.size} " +
          s"corruptAfter=${badAfter.size} " +
          s"named=${badAfter.exists(_.contains(victim.getName))}")
      }

      if (mode == "fetchfail") {
        // --- storage loss: delete one committed map output ----------------
        // Remove one of the 8 map data files of COMBINED's own shuffle
        // (resolved by id — sortByKey and the SQL jobs made others).
        val shuffleId = combined.dependencies.head
          .asInstanceOf[org.apache.spark.ShuffleDependency[_, _, _]].shuffleId
        val dir8 = Option(new File(root).listFiles())
          .getOrElse(Array.empty)
          .flatMap(a => Option(a.listFiles()).getOrElse(Array.empty))
          .find(_.getName == s"shuffle_$shuffleId").get
        val victim = dir8.listFiles().filter(_.getName.endsWith(".data")).head
        require(victim.delete(), s"could not delete $victim")
        println(s"DELETED ${victim.getName} from ${dir8.getName}")
        // Recovery: FetchFailedException → unregister that map output →
        // map-stage resubmit (≥2 extra stage submissions: failed result
        // attempt, map regen, result retry) → correct result, and the
        // shuffle dir is back to 8 data files (the regenerated map
        // commits under its new task attempt id).
        val b2 = Drain.untilStable(stageSubmits.get().toLong)
        val r3 = combined.collect().sortBy(_._1)
        val checksum3 = r3.map { case (k, v) => k * 31L + v }.sum
        val resub2 = Drain.untilStable(stageSubmits.get().toLong) - b2
        val dataFiles = dir8.listFiles().count(_.getName.endsWith(".data"))
        println(s"FETCHFAIL_OK checksum=$checksum3 stagesResubmitted=$resub2 " +
          s"dataFiles=$dataFiles")
      }
    } finally spark.stop()
  }
}
