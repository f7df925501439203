package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart

/** Optimization-round measurement aid (guide §1): run one or more declared
  * queries through the bench's noop-sink methodology and print a per-JOB
  * breakdown (duration + callsite) so the expensive phase of a
  * lifecycle-heavy query (governed writes, MV refresh, index maintenance,
  * final read) is visible without the Spark UI.
  *
  *   scripts/run_main.sh graft.ProfileQuery q269_star_join_mv
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  */
object ProfileQuery {

  private final class JobLog extends SparkListener {
    case class J(id: Int, desc: String, site: String, start: Long, var end: Long)
    val jobs = new ArrayBuffer[J]()
    // SQL execution id -> callsite of the root query (jobs spawned on the
    // broadcast/subquery pool report a lambda as their own callsite)
    val execSite = scala.collection.concurrent.TrieMap[Long, String]()
    private val open = scala.collection.concurrent.TrieMap[Int, J]()
    override def onOtherEvent(e: SparkListenerEvent): Unit = e match {
      case s: SparkListenerSQLExecutionStart =>
        execSite(s.executionId) = s.description
      case _ =>
    }
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      // stage name carries the callsite (e.g. "save at X.scala:123");
      // for broadcast/subquery-pool jobs prefer the SQL execution's root
      val stage = e.stageInfos.lastOption.map(_.name).getOrElse("")
      val execId = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
        .map(_.toLong)
      val site =
        if (stage.contains("withThreadLocalCaptured"))
          execId.flatMap(execSite.get).map("[exec] " + _).getOrElse(stage)
        else stage
      val j = J(e.jobId, desc, site, e.time, -1L)
      open(e.jobId) = j
      jobs.synchronized { jobs += j }
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      open.remove(e.jobId).foreach(_.end = e.time)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = if (args.nonEmpty) args.toSeq else Seq("q01_pricing_summary")
    names.foreach { name =>
      // untimed warmup, matching Bench
      GraftSession.withConfScope(spark) {
        graft.api.Graft.withCacheScope {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
      }
      val log = new JobLog
      spark.sparkContext.addSparkListener(log)
      val t0 = System.nanoTime()
      GraftSession.withConfScope(spark) {
        graft.api.Graft.withCacheScope {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
      }
      val wall = (System.nanoTime() - t0) / 1e9
      Drain.untilStable(log.jobs.size.toLong)
      spark.sparkContext.removeSparkListener(log)
      val js = log.jobs.toSeq
      val jobTotal = js.filter(_.end > 0).map(j => (j.end - j.start) / 1e3).sum
      println(f"\n===== $name%s wall=$wall%.3f s, ${js.size}%d jobs, " +
        f"job-time sum=$jobTotal%.3f s (gaps = driver-side work) =====")
      var prevEnd = -1L
      js.sortBy(_.start).foreach { j =>
        val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        val gap = if (prevEnd > 0) (j.start - prevEnd) / 1e3 else 0.0
        prevEnd = math.max(prevEnd, j.end)
        val label = if (j.desc.nonEmpty) j.desc else j.site
        println(f"  job ${j.id}%4d  ${dur}%8.3f s  (gap ${gap}%7.3f s)  $label%s")
      }
    }
    spark.stop()
  }
}
