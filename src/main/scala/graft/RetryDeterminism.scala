package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exactness under task failure + retry (run in its own JVM by
  * RetryDeterminismSpec — the suite session is `local[n]`, which fails
  * the whole job on first task failure; `local[4, 2]` enables the retry
  * scheduler path, reference `core/.../scheduler/TaskSetManager.scala`).
  *
  * A source partition throws on its FIRST attempt (tracked in a static
  * set — same-JVM executors in local mode), succeeds on retry. If the
  * engine's aggregates were order/attempt-dependent, the retried run
  * could emit a different total; the exact-decimal discipline
  * (Exact.dsum) makes the answer bit-identical to the failure-free run —
  * the property that lets 1000-executor jobs survive preemption without
  * silent numeric drift. Prints both checksums for the spec to compare.
  */
object RetryDeterminism {

  private val failedOnce =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master("local[4, 2]") // 2 task-failure attempts
        .appName("graft-retry-determinism")
        .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def totals(faulty: Boolean): String = {
      val base = spark.range(0, 400000, 1, 8)
        .select(pmod($"id", lit(97)).as("k"),
          (($"id" % 1000) / 100.0).as("v"))
      val src = if (!faulty) base else base.as[(Long, Double)]
        .mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          if (pid == 3 && failedOnce.add(pid))
            throw new RuntimeException("injected first-attempt failure")
          it
        }
        .toDF("k", "v")
      val rows = src.groupBy($"k")
        .agg(graft.functions.Exact.dsum($"v", 6).as("s"),
          count(lit(1)).as("n"))
        .orderBy($"k")
        .collect()
      rows.map(r => s"${r.getLong(0)}:${r.getDouble(1)}:${r.getLong(2)}")
        .mkString("|").hashCode.toString + s" rows=${rows.length}"
    }

    try {
      val clean = totals(faulty = false)
      val retried = totals(faulty = true)
      println(s"RETRY_OK clean=[$clean] retried=[$retried] " +
        s"equal=${clean == retried}")

      // ManifestSink retry-success path: the injected first-attempt
      // failure aborts that task's staged file; the retried attempt
      // commits, and the published manifest must still cover every row.
      val sinkDir = java.nio.file.Files
        .createTempDirectory("graft_manifest_retry").toString
      spark.range(0, 1000, 1, 4).select($"id")
        .write.mode("append").format("graft-manifest")
        .option("path", sinkDir).option("failPartition", 2).save()
      val manifest = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(sinkDir, "_MANIFEST")), "UTF-8").split("\n")
        .filterNot(_.startsWith("#")) // `#stats`/`#txn` metadata lines
      val tmps = new java.io.File(sinkDir).listFiles()
        .count(_.getName.endsWith(".tmp"))
      println(s"SINK_OK files=${manifest.length} " +
        s"rows=${manifest.map(_.split(",")(1).toLong).sum} tmps=$tmps")
    } finally spark.stop()
  }
}
