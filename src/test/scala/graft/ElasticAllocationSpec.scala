package graft

import org.scalatest.funsuite.AnyFunSuite

/** Elastic-executor proof (the POLICY half of SplitServe, reference
  * `core/.../ExecutorAllocationManager.scala:363-410` and
  * `scheduler/TaskSetManager.scala:440-452`): dynamic allocation runs
  * legally over SharedDirShuffleManager with shuffle tracking OFF
  * (supportsReliableStorage replaces the external shuffle service), the
  * idle pool drains to zero after the shuffle-producing job, and a later
  * job over that shuffle scales back up with FRESH executors and submits
  * exactly ONE stage — the departed executors' map output was never
  * invalidated and is served from the shared root. Drives
  * ElasticExecutorDemo in its own JVM (allocation manager + shuffle
  * manager are fixed at SparkContext creation).
  */
class ElasticAllocationSpec extends AnyFunSuite {

  test("dynamic allocation releases executors at idle; later stage reads " +
    "their shuffle output with zero recompute (local-cluster)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_elastic").toString + "/root"
    val (code, out) = TestJvm.run("graft.ElasticExecutorDemo", Seq(root),
      env = Seq("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13"))
    assert(code == 0, s"demo JVM failed:\n$out")
    assert(out.contains("PHASE1_OK checksum=20015584500 execs=2"), out)
    // every phase-1 executor was released; the pool hit zero
    assert(out.contains("RELEASED removed=2 active=0"), out)
    // one stage == result stage only (no map recompute), served to
    // executors that did not exist when the shuffle was written
    val phase2 = out.linesIterator.find(_.startsWith("PHASE2_OK"))
    assert(phase2.exists(_.contains(
      "checksum=20015584500 stagesSubmitted=1")), s"$phase2\n$out")
    assert(phase2.exists(l =>
      l.split("freshExecutors=")(1).trim.toInt >= 1),
      s"phase 2 reused a pre-release executor — not an elastic read: $phase2\n$out")
  }
}
