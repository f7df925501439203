package graft

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** True restart durability for the Hive-metastore path: runs
  * HiveCatalogRoundTrip `create` and `check` in two SEPARATE JVMs over
  * the same derby metastore directory. The second JVM shares nothing
  * with the first, so the table + permanent Hive UDF can only come back
  * from the metastore on disk — the property q163's in-memory catalog
  * demonstrates only per-session. Subprocesses keep the suite's shared
  * non-Hive SparkSession untouched (one SparkContext per JVM). */
class HiveMetastoreSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def runJvm(mode: String, base: String): (Int, String) = {
    val cmd = Seq("java") ++ addOpens ++ Seq(
      "-Xmx2g",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      s"-Dderby.stream.error.file=$base/derby.log",
      "-cp", System.getProperty("java.class.path"),
      "graft.HiveCatalogRoundTrip", mode, base)
    val out = new StringBuilder
    val code = cmd ! ProcessLogger(l => out.append(l).append('\n'), _ => ())
    (code, out.toString)
  }

  test("metastore table and permanent Hive UDF/UDTF/UDAF survive a JVM restart") {
    val base = java.nio.file.Files.createTempDirectory("graft_hive").toString
    val (c1, o1) = runJvm("create", base)
    assert(c1 == 0, s"create JVM failed:\n$o1")
    assert(o1.contains("CREATE_OK udf=1,2,3 udtf=10,20,30 udaf=2.0"), o1)
    val (c2, o2) = runJvm("check", base)
    assert(c2 == 0, s"check JVM failed:\n$o2")
    assert(o2.contains("CHECK_OK rows=1a,2b,3c udf=7 " +
      "udtf=1x,1y,2x,2y,3x,3y udaf=2.0"), o2)
  }
}
