package graft

import org.apache.spark.sql.SparkSession

/** Throwaway measurement aid (not part of the engine): compares a plain
  * Spark parquet write of lineitem against the manifest append of the
  * same rows, to locate q268's write-job floor. */
object ScratchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.df(spark, sfDir, "lineitem")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm the scan
    li.write.format("noop").mode("overwrite").save()
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          println(s"[scratch]   job ${e.jobId}: " +
            e.stageInfos.map(_.numTasks).mkString("+") + " tasks")
      })
    for (round <- 1 to 2) {
      time("noop (scan only)") { li.write.format("noop").mode("overwrite").save() }
      time("plain parquet write") {
        li.write.mode("overwrite").parquet("/tmp/scratch_plain")
      }
      val root = "/tmp/scratch_manifest"
      val dir = new org.apache.hadoop.fs.Path(root)
      dir.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(dir, true)
      val cat = "graft_scratch"
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      val cols = li.schema.fieldNames
        .map(n => s"$n ${li.schema(n).dataType.sql}").mkString(", ")
      spark.sql(s"CREATE TABLE $cat.li ($cols)")
      time("manifest append") { li.writeTo(s"$cat.li").append() }
      spark.sql(s"CREATE TABLE $cat.li2 ($cols) " +
        "TBLPROPERTIES('stats.ndv.columns'='l_orderkey')")
      time("manifest append + ndv") { li.writeTo(s"$cat.li2").append() }
    }
    spark.stop()
  }
}
