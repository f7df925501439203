package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestFiles

/** Table-maintenance procedures on the manifest format, reachable from
  * SQL via the DSv2 `ProcedureCatalog` seam (`CALL cat.system.proc(...)`
  * — Iceberg's maintenance convention):
  *
  *   - `compact` folds the current snapshot's files into `target_files`
  *     as ONE new snapshot — data identical, history intact;
  *   - `vacuum` is the only deletion path in the format: old snapshot
  *     files beyond the retention horizon go away, then data files no
  *     surviving version references;
  *   - `snapshots` is DESCRIBE HISTORY as a result set.
  */
class ManifestProceduresSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  private def write(root: String, ids: Range): Unit = {
    import spark.implicits._
    ids.toDF("id").select($"id".cast("long").as("id"),
        concat(lit("r-"), $"id").as("tag"))
      .repartition(2)
      .write.mode("append").format("graft-manifest")
      .option("path", root).save()
  }

  private def dataFiles(root: String): Set[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
  }

  private def withCatalog(name: String)(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_proc").toString
    Confs.withValues(spark,
      s"spark.sql.catalog.$name" -> "graft.sources.GraftManifestCatalog",
      s"spark.sql.catalog.$name.root" -> root) {
      body(root)
    }
  }

  test("compact folds the snapshot into fewer files, history intact") {
    withCatalog("graft_pc1") { root =>
      (0 until 4).foreach(i => write(s"$root/t", i * 10 until i * 10 + 5))
      assert(dataFiles(s"$root/t").size == 8) // 4 commits x 2 part files

      val res = spark.sql("CALL graft_pc1.system.compact('t', 2)").collect()
      assert(res.length == 1)
      assert(res.head.getInt(1) == 8 && res.head.getInt(2) == 2,
        res.head.toString)

      // Same data, fewer live files; v4 (pre-compaction) still readable.
      assert(spark.sql("SELECT count(*) AS n FROM graft_pc1.t")
        .head().getLong(0) == 20)
      assert(spark.sql("SELECT sum(id) AS s FROM graft_pc1.t").head().getLong(0) ==
        spark.sql("SELECT sum(id) AS s FROM graft_pc1.t VERSION AS OF 4")
          .head().getLong(0))
      val p = new Path(s"$root/t")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      assert(ManifestFiles.entries(fs, p, None).length == 2)
      // Compaction is copy-on-write: the old files still exist on disk
      // (v1..v4 reference them) until a vacuum.
      assert(dataFiles(s"$root/t").size == 10)
    }
  }

  test("vacuum drops old versions and deletes unreferenced data files") {
    withCatalog("graft_pc2") { root =>
      (0 until 3).foreach(i => write(s"$root/t", i * 10 until i * 10 + 5))
      spark.sql("CALL graft_pc2.system.compact('t', 1)")
      assert(dataFiles(s"$root/t").size == 7) // 6 originals + 1 compacted

      val res = spark.sql("CALL graft_pc2.system.vacuum('t', 1)").collect()
      assert(res.head.getInt(0) == 3, res.head.toString) // v1..v3 dropped
      assert(res.head.getInt(1) == 6, res.head.toString) // originals gone

      // Latest still reads fully; vacuumed history is now unreachable.
      assert(spark.sql("SELECT count(*) AS n FROM graft_pc2.t")
        .head().getLong(0) == 15)
      assert(dataFiles(s"$root/t").size == 1)
      val ex = intercept[Exception](
        spark.sql("SELECT count(*) AS n FROM graft_pc2.t VERSION AS OF 2").collect())
      assert(ex.getMessage.contains("no version 2"), ex.getMessage)
    }
  }

  test("snapshots lists version history with file and row counts") {
    withCatalog("graft_pc3") { root =>
      write(s"$root/t", 0 until 5)
      write(s"$root/t", 10 until 13)
      val rows = spark.sql("CALL graft_pc3.system.snapshots('t')")
        .orderBy("version").collect()
      assert(rows.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq ==
        Seq((1, 2, 5L), (2, 4, 8L)))
      assert(rows.forall(!_.isNullAt(3)))
    }
  }

  test("unknown procedure and bad arguments fail with clear errors") {
    withCatalog("graft_pc4") { root =>
      write(s"$root/t", 0 until 3)
      // Spark wraps the catalog's IllegalArgumentException.
      val ex = intercept[Exception](
        spark.sql("CALL graft_pc4.system.nope('t')").collect())
      assert(ex.getMessage.contains("Failed to load routine"), ex.getMessage)
      val ex2 = intercept[Exception](
        spark.sql("CALL graft_pc4.system.vacuum('t', 0)").collect())
      assert(ex2.getMessage.contains("retain_versions"), ex2.getMessage)
      // Defaults: target_files/retain_versions fall back to 1.
      spark.sql("CALL graft_pc4.system.compact('t')").collect()
      val p = new Path(s"$root/t")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      assert(ManifestFiles.entries(fs, p, None).length == 1)
    }
  }

  test("remove_orphan_files reclaims stale staging dirs, spares fresh " +
    "ones and everything committed") {
    withCatalog("graft_pc5") { root =>
      write(s"$root/t", 0 until 5)
      val p = new Path(s"$root/t")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      // a writer that died mid-job: staged task files, no commit/abort
      val stale = new Path(p, ".staging-dead-query")
      fs.mkdirs(stale)
      val orphan = new Path(stale, "part-00000-1.parquet.tmp")
      val out = fs.create(orphan, true)
      out.write("x".getBytes("UTF-8")); out.close()
      // age it past the horizon (mtime is the orphan test's only input)
      fs.setTimes(orphan, System.currentTimeMillis() - 48L * 3600000L, -1)
      fs.setTimes(stale, System.currentTimeMillis() - 48L * 3600000L, -1)
      // an IN-FLIGHT writer's staging: fresh mtimes, must survive
      val live = new Path(p, ".staging-live-query")
      fs.mkdirs(live)
      val inflight = new Path(live, "part-00000-2.parquet.tmp")
      val out2 = fs.create(inflight, true)
      out2.write("y".getBytes("UTF-8")); out2.close()

      val res = spark.sql(
        "CALL graft_pc5.system.remove_orphan_files('t', 24)").collect()(0)
      assert((res.getInt(0), res.getInt(1)) == ((1, 1)), res.toString)
      assert(!fs.exists(stale), "stale staging dir must be reclaimed")
      assert(fs.exists(inflight), "in-flight staging must survive")
      // committed data untouched
      assert(spark.read.format("graft-manifest")
        .option("path", s"$root/t").load().count() == 5L)
      // horizon 0 sweeps the rest (nothing fresh is in flight here)
      spark.sql(
        "CALL graft_pc5.system.remove_orphan_files('t', 0)").collect()
      assert(!fs.exists(live))
    }
  }
}
