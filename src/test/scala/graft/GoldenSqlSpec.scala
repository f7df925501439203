package graft

import scala.io.Source

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file SQL corpus (the reference's `SQLQueryTestSuite` pattern,
  * `sql/core/src/test/resources/sql-tests/`): each inputs/<cat>.sql runs
  * through `spark.sql` on sf0.001 and must reproduce the checked-in
  * DuckDB-generated results/<cat>.out byte-for-byte (after canonical
  * formatting). */
class GoldenSqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val categories = Seq("group-by", "join", "set-ops", "window")

  private def format(stmt: String): Seq[String] = {
    val df = spark.sql(stmt)
    val cols = df.columns.toSeq
    val rows = df.collect().map(_.toSeq.map {
      case null => "NULL"
      case v => v.toString
    }.mkString(","))
    ("-- " + stmt.replaceAll("\\s+", " ").take(80)) +:
      cols.mkString(",") +: rows.toSeq :+ ""
  }

  categories.foreach { cat =>
    test(s"golden corpus: $cat.sql matches checked-in results") {
      Tables.registerAll(spark, "/root/testdata/sf0.001")
      val input = Source.fromInputStream(
        getClass.getResourceAsStream(s"/sql-tests/inputs/$cat.sql")).mkString
      val expected = Source.fromInputStream(
        getClass.getResourceAsStream(s"/sql-tests/results/$cat.out")).mkString
      val actual = input.split(";").map(_.trim).filter(_.nonEmpty)
        .flatMap(format).mkString("\n")
      assert(actual.trim == expected.trim,
        s"golden mismatch for $cat:\n--- got ---\n$actual\n--- want ---\n$expected")
    }
  }
}
