package graft

import org.scalatest.funsuite.AnyFunSuite

/** Stage-level scheduling over the shared-dir shuffle (the
  * offer-stages-to-the-ephemeral-pool half of SplitServe's scheduler,
  * reference `scheduler/TaskSetManager.scala:440-452`): the map stage
  * runs on default-profile executors, the result stage is pinned via
  * `withResources` to a smaller "Lambda" profile whose executor only
  * fits on a worker after a default executor is released, and every
  * result task runs on that profile while reading the departed default
  * executors' map output from the shared root. Drives StageLevelDemo in
  * its own JVM. */
class StageLevelSpec extends AnyFunSuite {

  test("result stage pinned to a second executor profile reads the " +
    "default pool's shuffle from the shared root") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_stagelevel").toString + "/root"
    val (code, out) = TestJvm.run("graft.StageLevelDemo", Seq(root),
      env = Seq("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13"))
    assert(code == 0, s"demo JVM failed:\n$out")
    val line = out.linesIterator.find(_.startsWith("STAGELEVEL_OK"))
    assert(line.exists(_.contains("checksum=20015584500")), s"$line\n$out")
    assert(line.exists(l =>
      l.split("lambdaExecutors=")(1).split(" ")(0).toInt >= 1),
      s"no Lambda-profile executor spawned: $line\n$out")
    assert(line.exists(_.contains("resultOnLambdaOnly=true")),
      s"result tasks ran outside the pinned profile: $line\n$out")
    assert(line.exists(_.contains("defaultExecsReleased=true")),
      s"a default-pool executor served the result stage: $line\n$out")
  }
}
