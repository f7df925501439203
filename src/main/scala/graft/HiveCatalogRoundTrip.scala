package graft

import org.apache.spark.sql.SparkSession

/** Hive-metastore catalog round-trip (reference `sql/hive/` module:
  * `HiveExternalCatalog`, `HiveTableScanExec`, `hiveUDFs.scala` — the two
  * SURVEY §2 rows marked "optional"): a derby-backed metastore under a
  * caller-supplied directory, a persistent table, and PERMANENT Hive
  * functions registered through the `CREATE FUNCTION ... AS 'class'`
  * bridge — all three Hive function kinds the reference's
  * `hiveUDFs.scala` wraps: a scalar GenericUDF (`GenericUDFAbs` →
  * `HiveGenericUDF`), a table-generating GenericUDTF
  * (`GenericUDTFExplode` → `HiveGenericUDTF`), and an aggregate UDAF
  * (`UDAFPercentile` → `HiveUDAFFunction`).
  *
  * Run with mode `create` then, in a SEPARATE JVM, mode `check`: the
  * second process proves true restart durability — the table, its data,
  * and the function resolve from the metastore files alone, with no
  * shared in-memory state (this is the durability q163's in-memory
  * catalog cannot show). HiveMetastoreSpec drives exactly that two-JVM
  * sequence.
  *
  * Usage: HiveCatalogRoundTrip (create|check) <baseDir>
  */
object HiveCatalogRoundTrip {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val base = args(1)
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master("local[2]")
        .appName("graft-hive-roundtrip")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.warehouse.dir", s"$base/warehouse")
        .config("javax.jdo.option.ConnectionURL",
          s"jdbc:derby:;databaseName=$base/metastore_db;create=true")
        .enableHiveSupport())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      mode match {
        case "create" =>
          spark.sql("CREATE DATABASE IF NOT EXISTS graft_hive")
          spark.sql("DROP TABLE IF EXISTS graft_hive.kv")
          spark.sql("CREATE TABLE graft_hive.kv (k INT, v STRING) USING parquet")
          spark.sql("INSERT INTO graft_hive.kv VALUES (1,'a'),(2,'b'),(3,'c')")
          spark.sql("DROP FUNCTION IF EXISTS graft_hive.hive_abs")
          spark.sql("""CREATE FUNCTION graft_hive.hive_abs
                       AS 'org.apache.hadoop.hive.ql.udf.generic.GenericUDFAbs'""")
          spark.sql("DROP FUNCTION IF EXISTS graft_hive.hive_explode")
          spark.sql("""CREATE FUNCTION graft_hive.hive_explode
                       AS 'org.apache.hadoop.hive.ql.udf.generic.GenericUDTFExplode'""")
          spark.sql("DROP FUNCTION IF EXISTS graft_hive.hive_percentile")
          spark.sql("""CREATE FUNCTION graft_hive.hive_percentile
                       AS 'org.apache.hadoop.hive.ql.udf.UDAFPercentile'""")
          val viaUdf = spark.sql(
            "SELECT graft_hive.hive_abs(-k) AS a FROM graft_hive.kv ORDER BY a")
            .collect().map(_.get(0)).mkString(",")
          val viaUdtf = spark.sql(
            "SELECT graft_hive.hive_explode(array(10, 20, 30)) AS c")
            .collect().map(_.get(0)).mkString(",")
          val viaUdaf = spark.sql(
            """SELECT graft_hive.hive_percentile(CAST(k AS BIGINT), 0.5) AS p
               FROM graft_hive.kv""").collect().head.get(0)
          println(s"CREATE_OK udf=$viaUdf udtf=$viaUdtf udaf=$viaUdaf")
        case "check" =>
          val rows = spark.sql("SELECT k, v FROM graft_hive.kv ORDER BY k")
            .collect().map(r => s"${r.get(0)}${r.get(1)}").mkString(",")
          val f = spark.sql("SELECT graft_hive.hive_abs(-7) AS a")
            .collect().head.get(0)
          // UDTF over the persistent table: one row per (k, tag) —
          // the generator must resolve from the metastore alone.
          val g = spark.sql(
            """SELECT concat(CAST(k AS STRING), c) AS kc FROM graft_hive.kv
               LATERAL VIEW graft_hive.hive_explode(array('x','y')) t AS c
               ORDER BY kc""").collect().map(_.get(0)).mkString(",")
          val p = spark.sql(
            """SELECT graft_hive.hive_percentile(CAST(k AS BIGINT), 0.5) AS p
               FROM graft_hive.kv""").collect().head.get(0)
          println(s"CHECK_OK rows=$rows udf=$f udtf=$g udaf=$p")
        case other => sys.error(s"unknown mode $other")
      }
    } finally spark.stop()
  }
}
