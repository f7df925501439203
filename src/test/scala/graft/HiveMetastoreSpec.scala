package graft

import org.scalatest.funsuite.AnyFunSuite

/** True restart durability for the Hive-metastore path: runs
  * HiveCatalogRoundTrip `create` and `check` in two SEPARATE JVMs over
  * the same derby metastore directory. The second JVM shares nothing
  * with the first, so the table + permanent Hive UDF can only come back
  * from the metastore on disk — the property q163's in-memory catalog
  * demonstrates only per-session. Subprocesses keep the suite's shared
  * non-Hive SparkSession untouched (one SparkContext per JVM). */
class HiveMetastoreSpec extends AnyFunSuite {

  private def runJvm(mode: String, base: String): (Int, String) =
    TestJvm.run("graft.HiveCatalogRoundTrip", Seq(mode, base),
      sysProps = Seq("spark.sql.session.timeZone" -> "UTC",
        "derby.stream.error.file" -> s"$base/derby.log"))

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
