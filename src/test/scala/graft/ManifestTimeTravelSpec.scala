package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Versioned manifest snapshots end to end: append commits merge the
  * prior snapshot, overwrite truncates, every commit leaves an immutable
  * `_MANIFEST.v<N>`, and reads pin a version three ways — read option,
  * `VERSION AS OF` SQL, `TIMESTAMP AS OF` SQL — through the
  * GraftManifestCatalog (`TableCatalog.loadTable(ident, version)`).
  * Also covers the DSv2 read path itself: manifest-listed files only,
  * column pruning, schema from `_SCHEMA` (no inference scan). */
class ManifestTimeTravelSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  private def write(root: String, mode: String, ids: Range): Unit = {
    import spark.implicits._
    ids.toDF("id").select($"id".cast("long").as("id"),
        ($"id" * 2).cast("long").as("dbl"),
        concat(lit("row-"), $"id").as("tag"))
      .repartition(2)
      .write.mode(mode).format("graft-manifest")
      .option("path", root).save()
  }

  test("append merges, overwrite truncates, versions stay readable") {
    val root = java.nio.file.Files.createTempDirectory("graft_tt").toString + "/t1"
    write(root, "append", 0 until 3)      // v1: 3 rows
    write(root, "append", 100 until 102)  // v2: 5 rows
    write(root, "overwrite", 500 until 502) // v3: 2 rows

    def readV(v: Option[Int]) = {
      val r = spark.read.format("graft-manifest").option("path", root)
      v.fold(r)(n => r.option("versionAsOf", n.toString)).load()
    }
    assert(readV(None).count() == 2)
    assert(readV(Some(1)).as("v1").count() == 3)
    assert(readV(Some(2)).count() == 5)
    assert(readV(Some(3)).count() == 2)
    // Contents, not just counts: v2 = v1 ∪ the second append.
    val v2 = readV(Some(2)).collect().map(_.getLong(0)).sorted
    assert(v2.toSeq == Seq(0L, 1L, 2L, 100L, 101L))
    // Round-trip fidelity across types.
    val row = readV(Some(1)).where("id = 2").collect().head
    assert(row.getLong(1) == 4L && row.getString(2) == "row-2")
    // Unknown version fails with the available list.
    val ex = intercept[Exception](readV(Some(9)).count())
    assert(ex.getMessage.contains("no version 9"), ex.getMessage)
  }

  test("VERSION AS OF and TIMESTAMP AS OF resolve through the catalog") {
    val root = java.nio.file.Files.createTempDirectory("graft_tt").toString
    write(s"$root/events", "append", 0 until 4)   // v1
    write(s"$root/events", "append", 10 until 16) // v2: 10 rows
    // Deterministic commit timestamps for TIMESTAMP AS OF: backdate v1.
    val dir = new Path(s"$root/events")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.setTimes(new Path(dir, "_MANIFEST.v1"), 1000000L, -1)

    Confs.withValues(spark,
      "spark.sql.catalog.graft_tt" -> "graft.sources.GraftManifestCatalog",
      "spark.sql.catalog.graft_tt.root" -> root) {
      assert(spark.sql("SELECT count(*) AS n FROM graft_tt.events")
        .head().getLong(0) == 10)
      assert(spark.sql("SELECT count(*) AS n FROM graft_tt.events VERSION AS OF 1")
        .head().getLong(0) == 4)
      // Column pruning survives the catalog path (and parses only `dbl`).
      assert(spark.sql(
        "SELECT sum(dbl) AS s FROM graft_tt.events VERSION AS OF 1")
        .head().getLong(0) == (0 until 4).map(_ * 2).sum)
      // v1 was committed at epoch+1s; anything ≥ then and < v2's commit
      // resolves to v1.
      assert(spark.sql(
        "SELECT count(*) AS n FROM graft_tt.events TIMESTAMP AS OF '1970-01-02'")
        .head().getLong(0) == 4)
      assert(spark.sql("SHOW TABLES IN graft_tt").collect()
        .map(_.getString(1)).contains("events"))
    }
  }

  test("INSERT INTO / OVERWRITE resolve the path from catalog table properties") {
    val root = java.nio.file.Files.createTempDirectory("graft_tt").toString
    write(s"$root/ins", "append", 0 until 3) // v1: 3 rows
    // Distinct catalog name: CatalogManager caches instances by name, so
    // re-registering graft_tt here would silently keep test 2's root.
    Confs.withValues(spark,
      "spark.sql.catalog.graft_ttw" -> "graft.sources.GraftManifestCatalog",
      "spark.sql.catalog.graft_ttw.root" -> root) {
      // SQL writes carry no write options — the path must come from the
      // table properties the catalog attached at loadTable time.
      spark.sql("INSERT INTO graft_ttw.ins VALUES (7L, 14L, 'row-7')")
      assert(spark.sql("SELECT count(*) AS n FROM graft_ttw.ins")
        .head().getLong(0) == 4)
      assert(spark.sql("SELECT tag FROM graft_ttw.ins WHERE id = 7")
        .head().getString(0) == "row-7")
      // Each INSERT is a commit: the pre-insert snapshot stays readable.
      assert(spark.sql("SELECT count(*) AS n FROM graft_ttw.ins VERSION AS OF 1")
        .head().getLong(0) == 3)
      spark.sql("INSERT OVERWRITE graft_ttw.ins VALUES (9L, 18L, 'row-9')")
      assert(spark.sql("SELECT count(*) AS n FROM graft_ttw.ins")
        .head().getLong(0) == 1)
      assert(spark.sql("SELECT count(*) AS n FROM graft_ttw.ins VERSION AS OF 2")
        .head().getLong(0) == 4)
      // Catalog tables resolve strictly: a type-mismatched INSERT is
      // Spark's own analysis error. Path-based appends run under
      // ACCEPT_ANY_SCHEMA, so the sink's positional guard catches the
      // same mistake at plan time instead.
      val ex = intercept[Exception](
        spark.sql("INSERT INTO graft_ttw.ins VALUES (1L, 'oops', 2L)"))
      assert(ex.getMessage.contains("CANNOT_SAFELY_CAST"), ex.getMessage)
      import spark.implicits._
      val ex2 = intercept[IllegalArgumentException](
        Seq((1L, "oops")).toDF("id", "tag").write.mode("append")
          .format("graft-manifest").option("path", s"$root/ins").save())
      assert(ex2.getMessage.contains("schema mismatch"), ex2.getMessage)
    }
  }

  test("streaming read tails versions incrementally across restarts") {
    val root = java.nio.file.Files.createTempDirectory("graft_tt").toString + "/s1"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tt_ck").toString
    write(root, "append", 0 until 3)   // v1
    write(root, "append", 10 until 12) // v2

    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-manifest").option("path", root)
        .load()
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => got.add(r.getLong(0))); ()
        }
        .start()
      q.awaitTermination(60000)
      q.stop()
    }
    // First run: everything up to v2. An offset is a version, so the
    // engine checkpoints "version 2".
    runOnce()
    assert(got.toArray.map(_.asInstanceOf[Long]).sorted.toSeq ==
      Seq(0L, 1L, 2L, 10L, 11L))
    // Second run from the same checkpoint: only v3's NEW file is read.
    got.clear()
    write(root, "append", 20 until 24) // v3
    runOnce()
    assert(got.toArray.map(_.asInstanceOf[Long]).sorted.toSeq ==
      Seq(20L, 21L, 22L, 23L))
    // Non-append history (overwrite unlists files): the next batch must
    // fail loudly, not silently re-emit rewritten rows.
    got.clear()
    write(root, "overwrite", 90 until 92) // v4 truncates
    val ex = intercept[Exception](runOnce())
    assert(ex.getMessage.contains("not pure appends"),
      ex.getMessage)
  }

  test("changesFrom/changesTo read only the rows a version range added") {
    val root = java.nio.file.Files.createTempDirectory("graft_tt").toString + "/c1"
    write(root, "append", 0 until 3)    // v1
    write(root, "append", 10 until 14)  // v2
    write(root, "append", 20 until 22)  // v3
    def changes(from: Int, to: Option[Int]) = {
      val r = spark.read.format("graft-manifest").option("path", root)
        .option("changesFrom", from.toString)
      to.fold(r)(t => r.option("changesTo", t.toString)).load()
        .collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(changes(1, Some(2)) == (10L until 14L))
    assert(changes(1, None) == ((10L until 14L) ++ (20L until 22L)))
    assert(changes(0, Some(1)) == (0L until 3L))
    assert(changes(3, None) == Seq.empty)
    // Non-append history in the range fails loudly.
    write(root, "overwrite", 90 until 92) // v4
    val ex = intercept[Exception](changes(3, None))
    assert(ex.getMessage.contains("not pure appends"), ex.getMessage)
    // And the guard composes: changesFrom + versionAsOf is an error.
    val ex2 = intercept[Exception](
      spark.read.format("graft-manifest").option("path", root)
        .option("changesFrom", "1").option("versionAsOf", "2").load().collect())
    assert(ex2.getMessage.contains("mutually exclusive"), ex2.getMessage)
  }

  test("read plans only manifest-listed files, ignoring stray part files") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_tt").toString + "/t3"
    write(root, "append", 0 until 4)
    // A torn commit / stray writer leaves an unlisted part file behind:
    // directory listings would count it, manifest readers must not.
    val stray = new java.io.File(root, "part-99999-0")
    val pw = new java.io.PrintWriter(stray)
    pw.println("777,1554,row-777"); pw.close()
    assert(spark.read.format("graft-manifest").option("path", root)
      .load().where($"id" === 777).isEmpty)
    assert(spark.read.format("graft-manifest").option("path", root)
      .load().count() == 4)
  }
}
