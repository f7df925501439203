package graft

import org.scalatest.funsuite.AnyFunSuite

/** Persistent-catalog properties beyond q163's oracle check: the table
  * survives a fresh session state (temp views do not), and its data
  * lives as plain parquet under the warehouse — the restart-safe layout
  * a durable metastore would re-attach to. */
class CatalogPersistenceSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  test("persistent table outlives session state; temp view does not") {
    val db = "graft_spec_db"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    val dbPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"$db.db")
    dbPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(dbPath, true)
    spark.sql(s"CREATE DATABASE $db")
    Tables.df(spark, dir, "region").createOrReplaceTempView("spec_region_tmp")
    spark.sql(s"CREATE TABLE $db.region_t USING parquet AS SELECT * FROM spec_region_tmp")

    val s2 = spark.newSession()
    assert(s2.catalog.tableExists(s"$db.region_t"))
    assert(!s2.catalog.tableExists("spec_region_tmp"))
    assert(s2.table(s"$db.region_t").count() == 5)

    // Data is plain parquet in the warehouse: readable with no catalog.
    val loc = s2.sql(s"DESCRIBE TABLE EXTENDED $db.region_t")
      .collect().find(_.getString(0) == "Location").get.getString(1)
    assert(spark.read.parquet(loc).count() == 5)

    spark.sql(s"DROP DATABASE $db CASCADE")
    assert(!spark.catalog.tableExists(s"$db.region_t"))
  }
}
