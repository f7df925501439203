package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.shuffle.GraftShuffleMetrics

/** The pluggable shuffle seam actually carries the shuffle: a session
  * booted with `spark.shuffle.sort.io.plugin.class=GraftShuffleDataIO`
  * must (a) produce the same results as stock local-disk shuffle and
  * (b) account every committed map output in the plugin's counters.
  *
  * The plugin class is a SparkContext-creation-time conf, so this spec
  * manages its own context: it stops whatever context is active, runs
  * against a plugin-enabled one, and stops it again so later suites
  * rebuild the default session.
  */
class ShufflePluginSpec extends AnyFunSuite {

  test("shuffle flows through GraftShuffleDataIO and results are unchanged") {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master("local[4]")
        .appName("graft-shuffle-plugin")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.shuffle.sort.io.plugin.class",
          "graft.shuffle.GraftShuffleDataIO")
    ).getOrCreate()
    try {
      import spark.implicits._
      GraftShuffleMetrics.reset()
      val result = spark.range(0, 100000)
        .select(($"id" % 10).as("k"), $"id")
        .groupBy($"k").agg(org.apache.spark.sql.functions.sum($"id").as("s"))
        .orderBy($"k")
        .as[(Long, Long)].collect()
      // closed form: sum over {i < 100000 : i % 10 == k} = 10000*k + 10*(0+1+...+9999)
      val expected = (0L until 10L).map(k => (k, 10000L * k + 10L * (9999L * 10000L / 2)))
      assert(result.toSeq == expected)
      assert(GraftShuffleMetrics.mapOutputsCommitted.sum() > 0,
        "no map outputs crossed the plugin seam")
      assert(GraftShuffleMetrics.bytesWritten.sum() > 0,
        "no shuffle bytes accounted by the plugin")
      assert(GraftShuffleMetrics.partitionsWritten.sum() >=
        GraftShuffleMetrics.mapOutputsCommitted.sum())
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
