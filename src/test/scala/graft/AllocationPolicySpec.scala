package graft

import org.scalatest.funsuite.AnyFunSuite

/** The VM→ephemeral allocation POLICY (AllocationPolicy.scala) — the last
  * behavior surface of the reference's fork left unproven after round 9:
  * reference `core/.../ExecutorAllocationManager.scala:363-410` requests
  * `"LAMBDA"` executors first when backlog grows and falls back to `"VM"`
  * when the request fails; `scheduler/TaskSetManager.scala:440-452`
  * offers a Lambda at most one task set and bounds its lifetime. Drives
  * AllocationPolicyDemo in its own JVM (allocation manager + shuffle
  * manager are fixed at SparkContext creation) and asserts:
  *
  *   - pool-growth ORDER: the backlogged pinned stage grew ONLY the
  *     ephemeral pool (every executor added in the window carries the
  *     ephemeral profile id; the default pool did not grow);
  *   - ONE task set per ephemeral executor: the boundary release killed
  *     the first pool, the second pinned stage got disjoint fresh
  *     executors, and no ephemeral executor ever ran two task sets;
  *   - FALLBACK: an unsatisfiable ephemeral request (no worker fits the
  *     profile) missed its registration deadline and the job re-ran on
  *     the default pool with the identical result;
  *   - ZERO map recompute after release: re-reading the shuffle submits
  *     exactly one stage (shared-dir shuffle keeps the killed executors'
  *     output registered).
  */
class AllocationPolicySpec extends AnyFunSuite {

  test("ephemeral-first growth, one-task-set release, VM fallback, and " +
    "zero recompute after release (local-cluster)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_policy").toString + "/root"
    val (code, out) = TestJvm.run("graft.AllocationPolicyDemo", Seq(root),
      env = Seq("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13"))
    assert(code == 0, s"demo JVM failed:\n$out")

    val sum = "20015584500"
    // A: pinned backlog grew the ephemeral pool ONLY, no fallback taken
    val a = out.linesIterator.find(_.startsWith("POLICYA_OK"))
    assert(a.exists(l => l.contains(s"checksum=$sum") &&
      l.contains("fellBack=false") && l.contains("growthEphemeralOnly=true")),
      s"$a\n$out")

    // B: boundary release killed the pool, fresh disjoint executors served
    // the second pinned stage, no ephemeral executor saw two task sets
    val b = out.linesIterator.find(_.startsWith("POLICYB_OK"))
    assert(b.exists(l => l.contains(s"checksum=$sum") &&
      l.contains("removedOk=true") && l.contains("freshPool=true") &&
      l.contains("oneTaskSetPerEphemeral=true")), s"$b\n$out")
    assert(b.exists(l => l.split("released=")(1).split(" ")(0).toInt >= 1),
      s"$b\n$out")

    // C: the unsatisfiable profile fell back to the default pool
    val c = out.linesIterator.find(_.startsWith("POLICYC_OK"))
    assert(c.exists(l => l.contains(s"checksum=$sum") &&
      l.contains("usedFallback=true") &&
      l.contains("unsatisfiableRegistered=0")), s"$c\n$out")

    // D: the released executors' map output is still served — one stage
    val dline = out.linesIterator.find(_.startsWith("POLICYD_OK"))
    assert(dline.exists(l => l.contains(s"checksum=$sum") &&
      l.contains("stagesSubmitted=1")), s"$dline\n$out")
  }
}
