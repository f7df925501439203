package graft

import org.scalatest.funsuite.AnyFunSuite

/** Two concurrent applications on ONE shared shuffle root (the
  * multi-app namespacing contract of SharedDirShuffleManager): both
  * compute correctly while both are live, app `a`'s cleanup removes only
  * its own namespace (app `b`'s shuffle stays readable — proven by a
  * post-cleanup re-read, not just a directory listing), and after both
  * stop the root is empty. Each app runs in its own JVM
  * (SharedRootCoexistDemo); they rendezvous through marker files. */
class SharedRootCoexistSpec extends AnyFunSuite {

  test("two apps share one shuffle root: disjoint namespaces, scoped cleanup") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_coexist").toString + "/root"
    val env = Seq("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13")
    var resA: (Int, String) = null
    val tA = new Thread(() => {
      resA = TestJvm.run("graft.SharedRootCoexistDemo",
        Seq(root, "a", "b", "first"), env = env)
    })
    tA.start()
    val resB = TestJvm.run("graft.SharedRootCoexistDemo",
      Seq(root, "b", "a", "second"), env = env)
    tA.join(180000)
    assert(resA != null && resA._1 == 0, s"app a failed:\n${Option(resA).map(_._2)}")
    assert(resB._1 == 0, s"app b failed:\n${resB._2}")
    for (out <- Seq(resA._2, resB._2)) {
      assert(out.contains("COEX_PHASE1_OK"), out)
      // Σ_{i=1..100000} i = 5000050000 plus 31·Σ_{k=0..499} k = 3867250
      assert(out.contains("checksum=5003917250"), out)
      // while both apps were live, TWO app namespaces held shuffle files
      assert(out.contains("COEXIST_OK appDirs=2 ownAlive=true"), out)
    }
    // app a's cleanupApplication did not touch app b's files: b re-read
    // its shuffle AFTER a cleaned up, and only b's namespace remained
    assert(resB._2.contains("SURVIVED_OK ownAlive=true dirs=1 reread=true"),
      resB._2)
    assert(resB._2.contains("CLEANUP_OK rootEmpty=true"), resB._2)
  }
}
