package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestFiles

/** Row-level operations on the manifest table format — DELETE / UPDATE /
  * MERGE INTO via DSv2 `SupportsRowLevelOperations`, group-based
  * COPY_ON_WRITE (the seam Iceberg plugs). Properties pinned:
  *
  *   - correctness of each command's surviving rows;
  *   - SCALE: the runtime group filter on the `_file` metadata column
  *     means files with no matching rows are NOT rewritten — their
  *     manifest entries survive BY NAME across the operation;
  *   - every operation is one new snapshot: the pre-image stays
  *     readable via `VERSION AS OF` (copy-on-write never deletes data
  *     files, it only unlists them);
  *   - `_file` is also a user-queryable metadata column.
  */
class ManifestRowLevelSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  /** Two single-file append commits: file A holds ids 0-49, file B holds
    * ids 50-99 — so predicate locality maps to file locality. */
  private def seed(dir: String): Unit = {
    import spark.implicits._
    def half(ids: Range) = ids.toDF("id")
      .select($"id".cast("long").as("id"),
        ($"id" % 10).cast("long").as(("grp")),
        concat(lit("v-"), $"id").as("tag"))
      .coalesce(1)
    half(0 until 50).write.mode("append")
      .format("graft-manifest").option("path", dir).save()
    half(50 until 100).write.mode("append")
      .format("graft-manifest").option("path", dir).save()
  }

  private def entries(dir: String): Set[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    ManifestFiles.entries(fs, p, None).map(_._1).toSet
  }

  private def withCatalog(name: String)(body: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_rl").toString
    Confs.withValues(spark,
      s"spark.sql.catalog.$name" -> "graft.sources.GraftManifestCatalog",
      s"spark.sql.catalog.$name.root" -> root) {
      body(root)
    }
  }

  test("DELETE rewrites only the files containing matches") {
    withCatalog("graft_rl1") { root =>
      seed(s"$root/t")
      val before = entries(s"$root/t")
      assert(before.size == 2)

      spark.sql("DELETE FROM graft_rl1.t WHERE id < 10")

      assert(spark.sql("SELECT count(*) AS n FROM graft_rl1.t")
        .head().getLong(0) == 90)
      assert(spark.sql("SELECT min(id) AS m FROM graft_rl1.t")
        .head().getLong(0) == 10)
      // Group filter: file B (ids 50-99) had no matches — its entry must
      // survive by name; file A must be gone, replaced by a rewrite.
      val after = entries(s"$root/t")
      assert(before.intersect(after).size == 1,
        s"expected exactly one surviving file, before=$before after=$after")
      // Pre-image: the delete is a snapshot, v2 still has all 100 rows.
      assert(spark.sql("SELECT count(*) AS n FROM graft_rl1.t VERSION AS OF 2")
        .head().getLong(0) == 100)
    }
  }

  test("UPDATE applies to matching rows only, as one snapshot") {
    withCatalog("graft_rl2") { root =>
      seed(s"$root/t")
      spark.sql("UPDATE graft_rl2.t SET tag = concat('upd-', id) WHERE grp = 3")
      assert(spark.sql(
        "SELECT count(*) AS n FROM graft_rl2.t WHERE tag LIKE 'upd-%'")
        .head().getLong(0) == 10)
      assert(spark.sql("SELECT count(*) AS n FROM graft_rl2.t").head().getLong(0) == 100)
      assert(spark.sql("SELECT tag FROM graft_rl2.t WHERE id = 13")
        .head().getString(0) == "upd-13")
      assert(spark.sql("SELECT tag FROM graft_rl2.t WHERE id = 14")
        .head().getString(0) == "v-14")
      // Both files contain grp=3 rows (3 and 53…93): both rewrite.
      assert(spark.sql(
        "SELECT count(*) AS n FROM graft_rl2.t VERSION AS OF 2 WHERE tag LIKE 'upd-%'")
        .head().getLong(0) == 0)
    }
  }

  test("MERGE INTO upserts: matched update + not-matched insert") {
    withCatalog("graft_rl3") { root =>
      seed(s"$root/t")
      spark.range(45, 55)
        .selectExpr("id", "CAST(id % 10 AS LONG) AS grp",
          "concat('merged-', id) AS tag")
        .createOrReplaceTempView("rl3_src")
      spark.sql("""
        MERGE INTO graft_rl3.t AS t USING rl3_src AS s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET tag = s.tag
        WHEN NOT MATCHED THEN INSERT (id, grp, tag) VALUES (s.id, s.grp, s.tag)""")
      assert(spark.sql("SELECT count(*) AS n FROM graft_rl3.t").head().getLong(0) == 100)
      assert(spark.sql(
        "SELECT count(*) AS n FROM graft_rl3.t WHERE tag LIKE 'merged-%'")
        .head().getLong(0) == 10)
      assert(spark.sql("SELECT tag FROM graft_rl3.t WHERE id = 47")
        .head().getString(0) == "merged-47")
      assert(spark.sql("SELECT tag FROM graft_rl3.t WHERE id = 44")
        .head().getString(0) == "v-44")
      spark.catalog.dropTempView("rl3_src")
    }
  }

  test("MERGE with delete clause and source-only inserts") {
    withCatalog("graft_rl4") { root =>
      seed(s"$root/t")
      spark.range(90, 110)
        .selectExpr("id", "CAST(id % 10 AS LONG) AS grp",
          "concat('new-', id) AS tag")
        .createOrReplaceTempView("rl4_src")
      spark.sql("""
        MERGE INTO graft_rl4.t AS t USING rl4_src AS s ON t.id = s.id
        WHEN MATCHED AND t.id % 2 = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET tag = s.tag
        WHEN NOT MATCHED THEN INSERT (id, grp, tag) VALUES (s.id, s.grp, s.tag)""")
      // 90..99 matched: evens deleted (5), odds updated; 100..109 inserted.
      assert(spark.sql("SELECT count(*) AS n FROM graft_rl4.t").head().getLong(0) == 105)
      assert(spark.sql("SELECT count(*) AS n FROM graft_rl4.t WHERE id = 92")
        .head().getLong(0) == 0)
      assert(spark.sql("SELECT tag FROM graft_rl4.t WHERE id = 93")
        .head().getString(0) == "new-93")
      assert(spark.sql("SELECT count(*) AS n FROM graft_rl4.t WHERE id >= 100")
        .head().getLong(0) == 10)
      spark.catalog.dropTempView("rl4_src")
    }
  }

  test("ALTER TABLE evolves the schema as a metadata-only commit") {
    withCatalog("graft_rl6") { root =>
      seed(s"$root/t")
      val filesBefore = entries(s"$root/t")

      spark.sql("ALTER TABLE graft_rl6.t ADD COLUMN score BIGINT")
      spark.sql("ALTER TABLE graft_rl6.t RENAME COLUMN tag TO label")

      // Metadata-only: versions advanced, not one data file touched.
      assert(entries(s"$root/t") == filesBefore)
      // Old rows surface NULL for the added column; the rename is free.
      assert(spark.sql(
        "SELECT count(*) AS n FROM graft_rl6.t WHERE score IS NULL")
        .head().getLong(0) == 100)
      assert(spark.sql("SELECT label FROM graft_rl6.t WHERE id = 7")
        .head().getString(0) == "v-7")
      // New writes carry the widened arity; mixed files read together.
      spark.sql("INSERT INTO graft_rl6.t VALUES (200L, 0L, 'v-200', 9L)")
      assert(spark.sql(
        "SELECT count(*) AS n, sum(score) AS s FROM graft_rl6.t")
        .head().getLong(0) == 101)
      assert(spark.sql("SELECT sum(score) AS s FROM graft_rl6.t")
        .head().getLong(0) == 9)
      // The pre-evolution schema stays version-pinned (v2 = seed data).
      assert(spark.sql("SELECT * FROM graft_rl6.t VERSION AS OF 2")
        .schema.fieldNames.toSeq == Seq("id", "grp", "tag"))
      // DROP COLUMN works since round 11 (positional tombstone; deep
      // coverage in ManifestDropColumnSpec) …
      spark.sql("ALTER TABLE graft_rl6.t DROP COLUMN grp")
      assert(spark.table("graft_rl6.t").schema.fieldNames.toSeq ==
        Seq("id", "label", "score"))
      assert(spark.sql("SELECT count(*) FROM graft_rl6.t WHERE label = 'v-7'")
        .head().getLong(0) == 1L)
      // … while genuinely unsupported shapes still fail clearly (type
      // changes are refused — by Spark's own analysis for widening
      // shapes, by the catalog's explicit rejection for the rest).
      val ex = intercept[Exception](
        spark.sql("ALTER TABLE graft_rl6.t ALTER COLUMN id TYPE INT"))
      assert(ex.getMessage.toLowerCase.contains("not supported"),
        ex.getMessage)
    }
  }

  test("_file metadata column is selectable and stable across files") {
    withCatalog("graft_rl5") { root =>
      seed(s"$root/t")
      val byFile = spark.sql(
        "SELECT _file, count(*) AS n, min(id) AS lo FROM graft_rl5.t GROUP BY _file ORDER BY lo")
        .collect()
      assert(byFile.length == 2)
      assert(byFile.forall(_.getLong(1) == 50))
      assert(byFile.map(_.getString(0)).toSet == entries(s"$root/t"))
    }
  }
}
