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
    if (mode == "local")
      // AQE skew-split forced → reader served map-subrange requests
      assert(out.contains("SKEWREAD_OK equal=true skewSplit=true"), out)
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
