package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** NESTED schema evolution (round 12): struct fields store under
  * positional `c<index>` names at every nesting level, so `ALTER TABLE
  * … RENAME COLUMN m.a TO x` is metadata-only (zero data touched) and
  * `ADD COLUMN m.c T` appends at the struct's end, null-filling on
  * pre-evolution files through the reader's clipped-schema path. The
  * positional mapping is TABLE-relative, so nested pruning of a later
  * field reads the right storage column. Nested DROP stays refused
  * (positions inside structs are not tombstoned), as does evolution
  * through arrays/maps. */
class ManifestNestedEvolutionSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def freshCat(tag: String): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_nest_$tag").toString
    val cat = s"graft_nest_${tag}_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def seed(lo: Int, hi: Int) =
    spark.range(lo, hi).select($"id".as("k"),
      struct(($"id" % 7).cast("int").as("a"),
        concat(lit("b"), $"id" % 3).as("b")).as("m"))

  test("nested RENAME is metadata-only; pre- and post-rename files read " +
    "under the new name") {
    val (cat, root) = freshCat("ren")
    seed(0, 60).write.mode("append").format("graft-manifest")
      .option("path", s"$root/t").save()
    val filesBefore = new java.io.File(s"$root/t").listFiles()
      .filter(_.getName.startsWith("part-")).map(f => f.getName -> f.length).toSet
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN m.a TO score")
    assert(new java.io.File(s"$root/t").listFiles()
      .filter(_.getName.startsWith("part-")).map(f => f.getName -> f.length)
      .toSet == filesBefore, "nested rename must touch no data file")
    // old data reads under the new nested name
    assert(spark.sql(s"SELECT sum(m.score) FROM $cat.t").head().getLong(0)
      == (0 until 60).map(_ % 7).sum.toLong)
    // appends under the evolved schema mix transparently
    spark.range(60, 90).select($"id".as("k"),
        struct(($"id" % 7).cast("int").as("score"),
          concat(lit("b"), $"id" % 3).as("b")).as("m"))
      .write.mode("append").format("graft-manifest")
      .option("path", s"$root/t").save()
    assert(spark.sql(s"SELECT sum(m.score), count(DISTINCT m.b) FROM $cat.t")
      .head().toSeq == Seq((0 until 90).map(_ % 7).sum.toLong, 3L))
  }

  test("nested ADD appends at the struct end and null-fills old files; " +
    "pruning a later nested field reads the right storage column") {
    val (cat, root) = freshCat("add")
    seed(0, 40).write.mode("append").format("graft-manifest")
      .option("path", s"$root/t").save()
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN m.c BIGINT")
    // old rows: c is NULL; a/b intact
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE m.c IS NULL")
      .head().getLong(0) == 40L)
    spark.range(40, 70).select($"id".as("k"),
        struct(($"id" % 7).cast("int").as("a"),
          concat(lit("b"), $"id" % 3).as("b"), ($"id" * 2).as("c")).as("m"))
      .write.mode("append").format("graft-manifest")
      .option("path", s"$root/t").save()
    assert(spark.sql(s"SELECT sum(m.c) FROM $cat.t").head().getLong(0)
      == (40 until 70).map(_ * 2L).sum)
    // prune ONLY the second field: positional mapping must request c1,
    // not c0 — a mis-mapped index surfaces m.a's ints here
    assert(spark.sql(s"SELECT m.b FROM $cat.t WHERE k = 5").head().getString(0)
      == "b2")
    assert(spark.sql(s"SELECT count(DISTINCT m.b) FROM $cat.t")
      .head().getLong(0) == 3L)
    // and the third, post-evolution field alone
    assert(spark.sql(s"SELECT m.c FROM $cat.t WHERE k = 41").head().getLong(0)
      == 82L)
  }

  test("rename + add compose; copy-on-write UPDATE rewrites evolved " +
    "structs correctly") {
    val (cat, root) = freshCat("cow")
    seed(0, 30).write.mode("append").format("graft-manifest")
      .option("path", s"$root/t").save()
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN m.b TO tag")
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN m.w DOUBLE")
    spark.sql(s"UPDATE $cat.t SET m = named_struct(" +
      "'a', m.a, 'tag', 'hot', 'w', 1.5) WHERE k % 10 = 0")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE m.tag = 'hot'")
      .head().getLong(0) == 3L)
    assert(spark.sql(
        s"SELECT sum(m.w) FROM $cat.t").head().getDouble(0) == 4.5)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE m.w IS NULL")
      .head().getLong(0) == 27L)
    assert(spark.sql(s"SELECT sum(m.a) FROM $cat.t").head().getLong(0)
      == (0 until 30).map(_ % 7).sum.toLong,
      "untouched nested values must survive the rewrite")
  }

  test("nested DROP and evolution through arrays are refused loudly") {
    val (cat, root) = freshCat("ref")
    seed(0, 10).withColumn("arr",
        array(struct(lit(1).as("x"), lit("y").as("y"))))
      .write.mode("append").format("graft-manifest")
      .option("path", s"$root/t").save()
    val dropErr = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t DROP COLUMN m.a")
    }
    assert(dropErr.getMessage.contains("nested DROP"), dropErr.getMessage)
    val arrErr = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t ADD COLUMN arr.element.z INT")
    }
    assert(arrErr.getMessage != null)
    assert(spark.table(s"$cat.t").count() == 10L)
  }
}
