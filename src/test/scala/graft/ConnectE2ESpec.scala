package graft

import java.net.URLClassLoader

import org.apache.spark.sql.{Row, SparkSession => AbstractSession}
import org.scalatest.funsuite.AnyFunSuite

/** Spark Connect end to end: the engine served over the client-server
  * protocol Spark 4 users actually deploy (driver = gRPC service,
  * clients are thin). The server (`SparkConnectService`, shipped in
  * /opt/spark/jars) starts ON the engine's classic session — so
  * GraftExtensions (DEDUP TABLE parser, kernels, strategies) and the
  * manifest catalog are live for every remote session — and the client
  * is the REAL `spark-connect-client-jvm` loaded in a child classloader
  * (parent-first delegation resolves the unified abstract
  * `org.apache.spark.sql.SparkSession`/`Dataset` from sql-api, so the
  * remote session is driven through the same API surface as a local
  * one; no reflection past the builder).
  *
  * At 100 TB this is the deployment shape: one long-lived driver owns
  * the cluster, analysts connect ephemeral gRPC sessions — session
  * isolation, runtime-conf scoping, and the SQL extension surface all
  * have to survive the protocol hop, which is what these tests pin.
  */
class ConnectE2ESpec extends AnyFunSuite {

  private val clientJar = new java.io.File(
    "/opt/spark/jars/connect-repl/spark-connect-client-jvm_2.13-4.1.2.jar")

  private lazy val classic = GraftSession.local(4)

  /** Start the in-process gRPC service once (idempotent across tests). */
  private lazy val server: Unit = {
    val svc = Class.forName(
      "org.apache.spark.sql.connect.service.SparkConnectService$")
    val module = svc.getField("MODULE$").get(null)
    svc.getMethod("start", classOf[org.apache.spark.SparkContext])
      .invoke(module, classic.sparkContext)
  }

  /** A fresh remote session through the real client jar. */
  private def connect(): AbstractSession = {
    server
    val cl = new URLClassLoader(Array(clientJar.toURI.toURL),
      getClass.getClassLoader)
    val sessionCls = cl.loadClass("org.apache.spark.sql.connect.SparkSession$")
    val companion = sessionCls.getField("MODULE$").get(null)
    val builder = sessionCls.getMethod("builder").invoke(companion)
    val remote = builder.getClass.getMethod("remote", classOf[String])
      .invoke(builder, "sc://localhost:15002")
    remote.getClass.getMethod("create").invoke(remote)
      .asInstanceOf[AbstractSession]
  }

  test("a remote session answers SQL over testdata identically to the " +
    "classic session") {
    assume(clientJar.exists(), "client jar not shipped")
    val remote = connect()
    try {
      val sql = """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM parquet.`/root/testdata/sf0.001/orders.parquet`
        WHERE o_totalprice > 200000.0
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""
      val viaConnect = remote.sql(sql).collect().toSeq
      val viaClassic = classic.sql(sql).collect().toSeq
      assert(viaConnect == viaClassic)
      assert(viaConnect.nonEmpty)
    } finally remote.close()
  }

  test("the engine's DEDUP TABLE parser extension works over Connect") {
    assume(clientJar.exists(), "client jar not shipped")
    val remote = connect()
    try {
      remote.sql("""
        CREATE OR REPLACE TEMPORARY VIEW conn_dedup_src AS
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM parquet.`/root/testdata/sf0.001/orders.parquet`""")
      val deduped = remote.sql(
        "DEDUP TABLE conn_dedup_src BY (o_custkey) KEEP MIN o_orderkey")
      val viaConnect = deduped.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      // oracle on the classic side: min orderkey per customer, full row
      val expect = classic.sql("""
        SELECT o_custkey, MIN(o_orderkey) AS k
        FROM parquet.`/root/testdata/sf0.001/orders.parquet`
        GROUP BY o_custkey""").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(viaConnect == expect)
    } finally remote.close()
  }

  test("a manifest-catalog table written by the engine is served to " +
    "remote sessions, runtime conf scoped per session") {
    assume(clientJar.exists(), "client jar not shipped")
    import classic.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_connect").toString
    classic.range(500)
      .select($"id".as("k"), md5($"id".cast("string")).as("v"))
      .write.mode("append").format("graft-manifest")
      .option("path", s"$root/served").save()
    val remote = connect()
    try {
      val cat = "graft_conn_cat"
      remote.conf.set(s"spark.sql.catalog.$cat",
        "graft.sources.GraftManifestCatalog")
      remote.conf.set(s"spark.sql.catalog.$cat.root", root)
      val viaConnect = remote.sql(
        s"SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(v) AS mv FROM $cat.served")
        .collect()(0)
      assert(viaConnect.getLong(0) == 500L)
      // the catalog conf lives in the REMOTE session only — the classic
      // session must not see it (session isolation across the protocol)
      assert(classic.conf.getOption(s"spark.sql.catalog.$cat").isEmpty)
    } finally remote.close()
  }
}
