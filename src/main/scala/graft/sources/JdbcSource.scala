package graft.sources

import java.util.Properties

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}

/** JDBC source/sink (SURVEY.md §2.1, reference `JDBCRelation.scala:103`):
  * write a dimension to an embedded Derby database, read it back with a
  * PARTITIONED read (partitionColumn/bounds/numPartitions — the shape that
  * matters at scale: N concurrent range-queries instead of one serial
  * cursor), join and aggregate. Embedded Derby is single-JVM (fine under
  * local[*]); a cluster deployment points the same code at a networked
  * store.
  */
object JdbcSource extends QueryModule {

  val qJdbc: QueryDef = QueryDef(
    "q112_jdbc_partitioned_roundtrip",
    (s, d) => {
      import s.implicits._
      val url = s"jdbc:derby:target/graft-io/derby_${d.replaceAll("[^A-Za-z0-9]", "_")};create=true"
      val props = new Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      Tables.df(s, d, "customer")
        .select($"c_custkey", $"c_nationkey", $"c_acctbal")
        .write.mode(SaveMode.Overwrite).jdbc(url, "CUSTOMER_DIM", props)
      s.read
        .option("partitionColumn", "c_custkey")
        .option("lowerBound", "0")
        .option("upperBound", "200000")
        .option("numPartitions", "4")
        .jdbc(url, "CUSTOMER_DIM", props)
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n"),
          sum($"c_acctbal".cast("decimal(18,6)")).cast("double").as("bal"))
        .orderBy($"c_nationkey")
    },
    Some("""
      SELECT c_nationkey, COUNT(*) AS n,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS bal
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""))

  override def defs: Seq[QueryDef] = Seq(qJdbc)
}
