package graft

import org.scalatest.funsuite.AnyFunSuite

/** Disaggregated-shuffle proof (SplitServe's core delta, reference
  * `core/.../shuffle/HDFSShuffleBlockResolver.scala:38`): drives
  * ShuffleStorageDemo in separate JVMs (the shuffle manager is fixed at
  * SparkContext creation; suites share a session).
  *
  * `local` proves storage redirection: correct results through all three
  * writer paths, every shuffle file under the shared root, ZERO shuffle
  * files in executor-local block-manager dirs, re-run skips the map
  * stage. `cluster` (local-cluster[2,1,1024], real executor processes)
  * proves the reference's headline property: after one executor is
  * KILLED, a job over its completed shuffle still skips the map stage
  * (supportsReliableStorage keeps the dead executor's outputs
  * registered) and reduces correctly from the shared root.
  */
class SharedDirShuffleSpec extends AnyFunSuite {

  private def runJvm(mode: String, root: String): (Int, String) =
    // local-cluster executor launch resolves its command through
    // SPARK_HOME's release layout; SPARK_SCALA_VERSION skips the
    // source-tree probe ("Cannot find any build directories").
    TestJvm.run("graft.ShuffleStorageDemo", Seq(mode, root),
      env = Seq("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13"))

  private def check(mode: String): Unit = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_shuffle_$mode").toString + "/root"
    val (code, out) = runJvm(mode, root)
    assert(code == 0, s"$mode JVM failed:\n$out")
    assert(out.contains(
      "PHASE1_OK checksum=20015584500 firstKey=999 sqlSum=1274925000"), out)
    val storage = out.linesIterator.find(_.startsWith("STORAGE_OK"))
    assert(storage.exists(_.endsWith("localLeaks=0")),
      s"shuffle files leaked to executor-local dirs: $storage\n$out")
    assert(storage.exists(s =>
      s.split("sharedFiles=")(1).split(" ")(0).toInt > 0),
      s"no shuffle files in the shared root: $storage\n$out")
    // shuffle-read telemetry attributes shared-root traffic as REMOTE
    // storage (the ADVICE-flagged misattribution), never local disk
    val metrics = out.linesIterator.find(_.startsWith("READMETRICS_OK"))
    assert(metrics.exists(m =>
      m.split("remoteBytes=")(1).split(" ")(0).toLong > 0 &&
        m.split("localBytes=")(1).trim.toLong == 0), s"$metrics\n$out")
    if (mode == "local") {
      // AQE skew-split forced → reader served map-subrange requests
      assert(out.contains("SKEWREAD_OK equal=true skewSplit=true"), out)
      // checksum audit: clean before, one flipped byte detected after,
      // and the corrupt segment is named
      val audit = out.linesIterator.find(_.startsWith("AUDIT_OK"))
      assert(audit.exists(a => a.contains("corruptBefore=0") &&
        a.contains("corruptAfter=1") && a.contains("named=true") &&
        a.split("segments=")(1).split(" ")(0).toInt > 0), s"$audit\n$out")
    }
    if (mode == "cluster") {
      assert(out.contains("KILLED executor="), out)
      // a fresh SQL shuffle on the post-loss topology still round-trips
      assert(out.contains("POSTKILL_SQL_OK equal=true"), out)
    }
    // 1 stage == result stage only: the map stage was NOT recomputed
    assert(out.contains(
      "PHASE2_OK checksum=20015584500 stagesSubmitted=1"), out)
  }

  test("shared-dir shuffle: storage redirected, map stage reused (local)") {
    check("local")
  }

  test("shared-dir shuffle survives executor loss without map recompute " +
    "(local-cluster)") {
    check("cluster")
  }

  // Speculative execution itself cannot fire on one machine
  // (TaskSetManager.hasAttemptOnHost forbids a twin attempt on the
  // original's host, and every local/local-cluster executor shares
  // localhost), so the layout-level claim is proven directly: two
  // concurrent attempts of the SAME map partition — exactly what racing
  // speculative tasks produce — write and commit attempt-scoped files
  // that never touch each other, and each index resolves only its own
  // data. Also covers the .checksum persistence path.
  test("concurrent attempts of one map partition commit attempt-scoped " +
    "files — no collision") {
    import org.apache.spark.shuffle.graft.{SharedDirMapOutputWriter, SharedDirShuffle}
    val root = java.nio.file.Files
      .createTempDirectory("graft_attempts").toFile
    val Seq(w1, w2) = Seq(101L, 202L).map(attempt =>
      new SharedDirMapOutputWriter(root, 7, attempt, 4))
    for (p <- 0 until 4) { // interleaved, as two racing tasks would
      for ((w, fill, times) <- Seq((w1, 1, 1), (w2, 2, 2))) {
        val s = w.getPartitionWriter(p).openStream()
        s.write(Array.fill(times * (p + 1))(fill.toByte)); s.close()
      }
    }
    w1.commitAllPartitions(Array(11L, 22L, 33L, 44L))
    w2.commitAllPartitions(Array.empty)
    def bytes(f: java.io.File): Array[Byte] =
      java.nio.file.Files.readAllBytes(f.toPath)
    // each attempt's data file holds exactly its own writes
    val d1 = bytes(SharedDirShuffle.dataFile(root, 7, 101L))
    val d2 = bytes(SharedDirShuffle.dataFile(root, 7, 202L))
    assert(d1.length == 10 && d1.forall(_ == 1), d1.toSeq)
    assert(d2.length == 20 && d2.forall(_ == 2), d2.toSeq)
    // each index resolves its own offsets (cumulative, numPartitions+1)
    def offsets(f: java.io.File): Seq[Long] = {
      val in = new java.io.DataInputStream(new java.io.FileInputStream(f))
      try Seq.fill(5)(in.readLong()) finally in.close()
    }
    assert(offsets(SharedDirShuffle.indexFile(root, 7, 101L)) ==
      Seq(0L, 1L, 3L, 6L, 10L))
    assert(offsets(SharedDirShuffle.indexFile(root, 7, 202L)) ==
      Seq(0L, 2L, 6L, 12L, 20L))
    // checksums persisted for the attempt that supplied them, only
    val ck = new java.io.DataInputStream(new java.io.FileInputStream(
      SharedDirShuffle.checksumFile(root, 7, 101L)))
    try assert(Seq.fill(4)(ck.readLong()) == Seq(11L, 22L, 33L, 44L))
    finally ck.close()
    assert(!SharedDirShuffle.checksumFile(root, 7, 202L).exists())
    // no temp files survive either commit
    val leftover = SharedDirShuffle.shuffleDir(root, 7).listFiles()
      .map(_.getName).filter(_.endsWith(".tmp"))
    assert(leftover.isEmpty, leftover.toSeq)
  }

  test("lost shared-root file → FetchFailedException → map regenerated, " +
    "job recovers") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_shuffle_fetchfail").toString + "/root"
    val (code, out) = runJvm("fetchfail", root)
    assert(code == 0, s"fetchfail JVM failed:\n$out")
    assert(out.contains("DELETED"), out)
    val line = out.linesIterator.find(_.startsWith("FETCHFAIL_OK"))
    // correct result after recovery…
    assert(line.exists(_.contains("checksum=20015584500")), s"$line\n$out")
    // …via a real map-stage resubmission (failed result attempt + map
    // regen + result retry), not a silent reread
    assert(line.exists(l =>
      l.split("stagesResubmitted=")(1).split(" ")(0).toInt >= 2),
      s"no map recompute happened: $line\n$out")
    // the regenerated map output landed back in the shared root (the
    // resubmitted stage may legally recommit any subset of maps under
    // fresh attempt ids, so the dir holds ≥ 8 data files — the committed
    // 8 the checksum proves readable, plus superseded old attempts)
    assert(line.exists(l =>
      l.split("dataFiles=")(1).trim.toInt >= 8), s"$line\n$out")
  }
}
