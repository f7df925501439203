package graft.operators

import org.apache.spark.sql.SparkSession

import graft.{QueryDef, QueryModule, Tables}

/** Persistent-catalog surface (reference `sql/catalyst/.../catalog/
  * SessionCatalog.scala` + `ExternalCatalog`): `CREATE DATABASE`, a
  * persistent `USING parquet` table in the warehouse, `INSERT INTO`, and
  * cross-session visibility. The reference ships a Hive metastore for
  * this (`sql/hive/`, SURVEY §1.4 — marked optional for us); the
  * Spark-native equivalent is the built-in catalog over a warehouse
  * directory: table data AND the database live as plain parquet/dirs
  * under `spark.sql.warehouse.dir`, so any engine (or a later Spark app
  * pointed at the same warehouse + metastore) reads them back.
  *
  * The query proves the persistence property the session can prove:
  * after `newSession()` (fresh `SessionState` — all temp views and the
  * current-database setting are gone, exactly what dies on restart) the
  * table is still resolvable by qualified name and returns the
  * CTAS + INSERT contents. Full process-restart durability additionally
  * needs a durable metastore (Hive/JDBC), which is a deployment choice,
  * not an engine operator — the data layout here is already restart-safe.
  */
object CatalogPersistence extends QueryModule {

  val qPersistentCatalog: QueryDef = QueryDef(
    "q163_persistent_catalog",
    (s, d) => {
      val db = "graft_db_" + d.replaceAll("[^A-Za-z0-9]", "_")
      s.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      // The warehouse layout outlives the in-memory catalog (that IS the
      // persistence being demonstrated): a previous application's table
      // directory is invisible to this JVM's DROP DATABASE, so clear the
      // on-disk location too before re-creating.
      val dbPath = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), s"$db.db")
      dbPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(dbPath, true)
      s.sql(s"CREATE DATABASE $db")
      Tables.df(s, d, "nation").createOrReplaceTempView("graft_nation_src")
      s.sql(s"""CREATE TABLE $db.nation_t USING parquet AS
                SELECT n_nationkey, n_name, n_regionkey
                FROM graft_nation_src""")
      s.sql(s"""INSERT INTO $db.nation_t
                SELECT n_nationkey + 1000, n_name, n_regionkey
                FROM graft_nation_src WHERE n_regionkey = 0""")
      // Fresh session state: temp views are gone; only the persistent
      // catalog can resolve the qualified name now.
      val s2 = s.newSession()
      s2.sql(s"""SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(n_nationkey) AS BIGINT) AS keysum
                 FROM $db.nation_t
                 GROUP BY n_regionkey ORDER BY n_regionkey""")
    },
    Some("""
      WITH t AS (
        SELECT n_nationkey, n_name, n_regionkey FROM nation
        UNION ALL
        SELECT n_nationkey + 1000, n_name, n_regionkey
        FROM nation WHERE n_regionkey = 0)
      SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_nationkey) AS BIGINT) AS keysum
      FROM t GROUP BY n_regionkey ORDER BY n_regionkey"""))

  override def defs: Seq[QueryDef] = Seq(qPersistentCatalog)
}
