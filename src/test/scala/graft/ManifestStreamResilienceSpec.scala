package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Round-12 incremental-read resilience:
  *
  *   - `option("ignoreDeletes", true)` — the Delta escape hatch: a 24/7
  *     consumer acknowledges delete-bearing ranges (retention metadata
  *     deletes, MOR delete vectors) and keeps tailing the APPENDED
  *     entries instead of dying; without the option the tail still
  *     fails loudly (the safe default);
  *   - a `changesFrom`/restart version that vacuum expired surfaces as
  *     "version ... expired", never a raw missing-file error;
  *   - `vacuum(t, retain_versions, retain_hours)` — time-based
  *     retention composing with the count as the more generous horizon.
  */
class ManifestStreamResilienceSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def freshCat(tag: String): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_res_$tag").toString
    val cat = s"graft_res_${tag}_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def append(path: String, lo: Int, hi: Int): Unit =
    spark.range(lo, hi).select($"id".as("k"), concat(lit("v"), $"id").as("s"))
      .coalesce(1).write.mode("append").format("graft-manifest")
      .option("path", path).save()

  /** Drain the stream once with AvailableNow; returns collected keys. */
  private def runOnce(path: String, ckpt: String,
      ignoreDeletes: Boolean): Seq[Long] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val reader = spark.readStream.format("graft-manifest").option("path", path)
    val q = (if (ignoreDeletes) reader.option("ignoreDeletes", "true")
             else reader).load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got.add(r.getLong(0))); ()
      }
      .start()
    q.awaitTermination(60000)
    q.stop()
    got.toArray.map(_.asInstanceOf[Long]).sorted.toSeq
  }

  test("a stream survives a retention delete with ignoreDeletes and " +
    "still fails loudly without it") {
    val (cat, root) = freshCat("ret")
    val path = s"$root/t"
    val ckptDies = java.nio.file.Files.createTempDirectory("graft_res_ck1").toString
    val ckptLives = java.nio.file.Files.createTempDirectory("graft_res_ck2").toString
    append(path, 0, 100)    // v1 (one file: k in [0,100))
    append(path, 100, 200)  // v2
    assert(runOnce(path, ckptDies, ignoreDeletes = false)
      == (0L until 200L))
    assert(runOnce(path, ckptLives, ignoreDeletes = true)
      == (0L until 200L))
    // file-aligned retention delete: a pure snapshot edit unlists v1's file
    spark.sql(s"DELETE FROM $cat.t WHERE k < 100")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 100L)
    append(path, 200, 250)  // v4: fresh appends after the delete
    val ex = intercept[Exception] {
      runOnce(path, ckptDies, ignoreDeletes = false)
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(ex).exists(_.contains("not pure appends")),
      chain(ex).mkString(" | "))
    // the acknowledging consumer keeps tailing: only the NEW appends
    assert(runOnce(path, ckptLives, ignoreDeletes = true)
      == (200L until 250L))
  }

  test("a stream crosses a merge-on-read delete range with ignoreDeletes") {
    val (cat, root) = freshCat("mor")
    val path = s"$root/t"
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, s STRING) " +
      "TBLPROPERTIES('delete.mode'='merge-on-read')")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_res_ck3").toString
    append(path, 0, 50)
    assert(runOnce(path, ckpt, ignoreDeletes = true) == (0L until 50L))
    spark.sql(s"DELETE FROM $cat.t WHERE k % 5 = 0") // positional delete file
    append(path, 50, 80)
    // appended rows stream; already-emitted deleted rows are not
    // retracted (the documented at-least-the-appends contract)
    assert(runOnce(path, ckpt, ignoreDeletes = true) == (50L until 80L))
    // batch incremental read honors the same option
    val ex = intercept[Exception] {
      spark.read.format("graft-manifest").option("path", path)
        .option("changesFrom", "2").load().collect()
    }
    assert(ex.getMessage.contains("merge-on-read deletes"), ex.getMessage)
    assert(spark.read.format("graft-manifest").option("path", path)
      .option("changesFrom", "2").option("ignoreDeletes", "true").load()
      .select($"k").collect().map(_.getLong(0)).sorted.toSeq
      == (50L until 80L))
  }

  test("an expired (vacuumed) changesFrom version reports 'expired', " +
    "not a missing file") {
    val (cat, root) = freshCat("exp")
    val path = s"$root/t"
    append(path, 0, 10)   // v1
    append(path, 10, 20)  // v2
    append(path, 20, 30)  // v3
    spark.sql(s"CALL $cat.system.vacuum('t', 1)").collect()
    val ex = intercept[Exception] {
      spark.read.format("graft-manifest").option("path", path)
        .option("changesFrom", "1").load().collect()
    }
    assert(ex.getMessage.contains("expired"), ex.getMessage)
    assert(ex.getMessage.contains("retained versions"), ex.getMessage)
  }

  test("vacuum retain_hours composes with retain_versions as the more " +
    "generous horizon") {
    val (cat, root) = freshCat("age")
    val path = s"$root/t"
    append(path, 0, 10)   // v1
    append(path, 10, 20)  // v2
    append(path, 20, 30)  // v3
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    def versions(): Seq[Int] = ManifestFiles.versions(fs, new Path(path)).sorted
    assert(versions() == Seq(1, 2, 3))
    // young versions survive a count-only-would-drop vacuum
    spark.sql(s"CALL $cat.system.vacuum('t', 1, 1000)").collect()
    assert(versions() == Seq(1, 2, 3),
      "versions inside the age horizon must survive")
    // age v1 and v2 out artificially (2h-old commit times)
    val old = System.currentTimeMillis() - 2 * 3600 * 1000L
    Seq(1, 2).foreach { v =>
      assert(new java.io.File(s"$path/_MANIFEST.v$v").setLastModified(old))
    }
    spark.sql(s"CALL $cat.system.vacuum('t', 1, 1)").collect()
    assert(versions() == Seq(3),
      "aged-out versions beyond the count horizon must drop")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 30L)
  }
}
