package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan for the headline
  * queries so pushdown (PushedFilters/ReadSchema), broadcast choices, and
  * WholeStageCodegen spans can be reviewed (`sbt "runMain graft.Explain
  * [queryName...]"`).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
