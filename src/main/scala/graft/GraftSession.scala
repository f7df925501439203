package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-minded defaults.
  *
  * The reference (PSU-Cloud/splitserve, a Spark 2.1 fork) exposes Spark's own
  * SQL surface; we target the modern equivalent with configs pinned for
  * (a) Spark-2.1-parity semantics (non-ANSI casts, UTC session time zone —
  * reference `sql/catalyst/.../expressions/Cast.scala` is permissive) and
  * (b) 100 TB posture: AQE on (runtime re-plan, skew-join splitting,
  * partition coalescing — the modern replacement for the reference's
  * experimental `ExchangeCoordinator`, see SURVEY.md §4.2).
  *
  * On a real cluster the same builder is used; only `master` and the
  * shuffle-partition count change (shuffle partitions should be ~2-3× total
  * executor cores, or left to AQE's coalescing with a high initial value).
  */
object GraftSession {

  /** Apply engine defaults onto any builder (shared by tests/mains).
    * The extensions conf makes the engine's seams (TopKPerKey strategy,
    * SQL kernels, DEDUP TABLE parser + its resolution rule) part of the
    * DEFAULT deployment — the same single conf a cluster would set. */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.GraftExtensions")
    // fork-free chmod on the local FS (the native-lib behavior; without
    // it every created file shells out to /bin/chmod twice — see
    // graft.sources.FastLocalFileSystem)
    .config("spark.hadoop.fs.file.impl", "graft.sources.FastLocalFileSystem")
    // same fix for the FileContext/AbstractFileSystem API (snapshot
    // pointer swings go through FileContext.rename, which otherwise
    // resolves file:// to Hadoop's own LocalFs and forks `readlink`
    // per link-status probe — see graft.sources.FastLocalFs)
    .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
      "graft.sources.FastLocalFs")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (32L << 20).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.sql.ui.explainMode", "formatted")
    .config("spark.ui.enabled", "false")

  /** Run `body` with the session's runtime conf SNAPSHOTTED and restored
    * afterwards: queries that legitimately set session confs while they
    * run (catalog registrations, `spark.sql.sources.v2.bucketing.enabled`
    * for storage-partitioned joins) no longer leak them into the next
    * query of a shared Verify/Bench session. Scopes the whole
    * construct+execute span — the confs matter at physical-planning
    * time, so restoring at construction would defeat them. Keys that
    * refuse to restore (static confs) were never settable at runtime
    * and are left alone. */
  def withConfScope[T](spark: SparkSession)(body: => T): T = {
    val before = spark.conf.getAll
    try body
    finally {
      val after = spark.conf.getAll
      (after.keySet -- before.keySet).foreach { k =>
        try spark.conf.unset(k) catch { case _: Exception => }
      }
      before.foreach { case (k, v) =>
        if (!after.get(k).contains(v))
          try spark.conf.set(k, v) catch { case _: Exception => }
      }
    }
  }

  /** Local session for tests and ad-hoc runs. */
  def local(cores: Int = 4, shufflePartitions: Int = -1): SparkSession = {
    val sp = if (shufflePartitions > 0) shufflePartitions else cores
    val spark = tune(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", sp.toString)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
