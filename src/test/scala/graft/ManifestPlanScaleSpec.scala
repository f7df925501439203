package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** PLAN-PATH SCALE PROOF (round 14 — the missing half of the round-13
  * segment "done"): the same logical table built at two file counts a
  * HUNDREDFOLD apart must cost a selective scan the same plan-time
  * metadata I/O — segment reads grow with the MATCHING data, never the
  * table's total file count. Entries are manifest-only (no data bytes
  * land on disk): planning never opens data files, so the spec measures
  * exactly the metadata path a 10⁶-file corpus's driver would walk. */
class ManifestPlanScaleSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  /** Publish `commits` snapshots of `filesPer` manifest-only entries
    * each. Every entry covers a disjoint k-range of width 10, exactly
    * like time-keyed appends would, so a point predicate matches ONE
    * entry — and `#segstats` union ranges let whole segments prune. */
  private def buildTable(path: String, commits: Int, filesPer: Int): Unit = {
    val dir = new Path(path)
    val hconf = spark.sessionState.newHadoopConf()
    val fs = dir.getFileSystem(hconf)
    val schema = new StructType().add("k", LongType)
    (0 until commits).foreach { c =>
      val lines = (0 until filesPer).flatMap { f =>
        val name = f"synthetic-$c%05d-$f%05d.parquet"
        val lo = (c.toLong * filesPer + f) * 10
        Seq(s"$name,10",
          ManifestFiles.statsLine(name, 1000L, Seq(0 ->
            ManifestFiles.ColStats(0, Some(lo.toString),
              Some((lo + 9).toString)))))
      }.toArray
      ManifestFiles.publishSnapshotV(fs, hconf, dir,
        (prev, _) => prev ++ lines, schema)
    }
  }

  /** Cold-cache plan of `k = <point>`: (segment files read, partitions
    * planned). Planning only — the scan never executes. */
  private def planReads(path: String, k: Long): (Long, Int) = {
    ManifestFiles.clearSegmentCache()
    val before = ManifestFiles.segmentReads
    val df = spark.read.format("graft-manifest").option("path", path)
      .load().filter(col("k") === k)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in the plan"))
    val parts = scan.inputPartitions.length
    (ManifestFiles.segmentReads - before, parts)
  }

  test("a selective scan's plan-time segment reads track the MATCH, " +
    "not the table: 100x the files, same files planned, bounded reads") {
    val rootS = java.nio.file.Files
      .createTempDirectory("graft_scale_s").toString + "/t"
    val rootB = java.nio.file.Files
      .createTempDirectory("graft_scale_b").toString + "/t"
    buildTable(rootS, 2, 100)    //    200 entries,  2 segments
    buildTable(rootB, 100, 200)  // 20,000 entries, ~40+ segments (LSM)
    val dirB = new Path(rootB)
    val fsB = dirB.getFileSystem(spark.sessionState.newHadoopConf())
    val totalSegsB = ManifestFiles.segmentRefsFromRaw(
      ManifestFiles.rawLinesOf(fsB, dirB, None)).size
    val totalEntriesB = ManifestFiles.entries(fsB, dirB, None).length
    assert(totalEntriesB == 20000)
    assert(totalSegsB >= 10, s"expected a segmented big table, " +
      s"got $totalSegsB segments")
    // the SAME point predicate against both tables
    val (readsS, partsS) = planReads(rootS, 55L)
    val (readsB, partsB) = planReads(rootB, 55L)
    // correctness of the plan: exactly the one matching file survives
    assert(partsS == 1, s"small table planned $partsS files")
    assert(partsB == 1, s"big table planned $partsB files")
    // THE scale assertion: metadata reads on the 100x table stay within
    // a small constant of the 1x table — never O(total segments)
    assert(readsS >= 1)
    assert(readsB <= math.max(4L, readsS * 4),
      s"plan-time segment reads grew with table size: " +
        s"$readsB reads at 20k files vs $readsS at 200 " +
        s"($totalSegsB segments available)")
    assert(readsB < totalSegsB / 2,
      s"a selective plan read $readsB of $totalSegsB segments — " +
        "segment pruning is not engaging")
  }

  test("an UNSELECTIVE scan still materializes everything (pruning is " +
    "exact, never lossy) and a warm re-plan costs zero reads") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_scale_u").toString + "/t"
    buildTable(root, 10, 50) // 500 entries
    val dir = new Path(root)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    ManifestFiles.clearSegmentCache()
    val before = ManifestFiles.segmentReads
    val df = spark.read.format("graft-manifest").option("path", root).load()
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in the plan"))
    assert(scan.inputPartitions.length == 500)
    val coldReads = ManifestFiles.segmentReads - before
    assert(coldReads >= 1)
    // warm re-plan: the (bounded, LRU) cache serves every segment
    val before2 = ManifestFiles.segmentReads
    val df2 = spark.read.format("graft-manifest").option("path", root)
      .load().filter(col("k") === 123L)
    val scan2 = df2.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in the plan"))
    assert(scan2.inputPartitions.length == 1)
    assert(ManifestFiles.segmentReads - before2 == 0L,
      "warm plan re-read segments")
  }
}
