package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Snapshot REFS (round 12 — Iceberg tags + rollback): `CALL
  * create_tag/drop_tag` pin versions under names that resolve in
  * `VERSION AS OF 'name'` (catalog and path reads alike) and that
  * VACUUM refuses to expire; `CALL rollback(t, v)` restores an old
  * snapshot as a NEW version — history is never destroyed. */
class ManifestRefsSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def freshCat(tag: String): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_refs_$tag").toString
    val cat = s"graft_refs_${tag}_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def ins(cat: String, lo: Int, hi: Int): Unit =
    spark.range(lo, hi).select($"id".as("k")).writeTo(s"$cat.t").append()

  test("rollback restores an old snapshot as a NEW version; the bad " +
    "history stays time-travelable; bad targets fail loudly") {
    val (cat, _) = freshCat("rb")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")          // v1
    ins(cat, 0, 100)                                      // v2
    ins(cat, 100, 160)                                    // v3
    assert(spark.table(s"$cat.t").count() == 160L)
    val res = spark.sql(s"CALL $cat.system.rollback('t', 2)").collect()
    assert(res.head.getInt(0) == 3 && res.head.getInt(1) == 2 &&
      res.head.getInt(2) == 4)
    assert(spark.table(s"$cat.t").count() == 100L)
    // the rolled-over version is still there: rollback FORWARD works too
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 3")
      .head().getLong(0) == 160L)
    spark.sql(s"CALL $cat.system.rollback('t', 3)")
    assert(spark.table(s"$cat.t").count() == 160L)
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.rollback('t', 99)").collect()
    }
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    // appends after a rollback build on the restored state
    ins(cat, 160, 170)
    assert(spark.table(s"$cat.t").count() == 170L)
  }

  test("tags resolve in VERSION AS OF and path reads; duplicates and " +
    "numeric names are rejected; unknown refs list available tags") {
    val (cat, root) = freshCat("tag")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")          // v1
    ins(cat, 0, 50)                                       // v2
    val r = spark.sql(s"CALL $cat.system.create_tag('t', 'golden')")
      .collect() // defaults to latest
    assert(r.head.getString(0) == "golden" && r.head.getInt(1) == 2)
    ins(cat, 50, 80)                                      // v3
    assert(spark.table(s"$cat.t").count() == 80L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 'golden'")
      .head().getLong(0) == 50L)
    // path-based reads resolve the same refs
    assert(spark.read.format("graft-manifest")
      .option("path", s"$root/t").option("versionAsOf", "golden")
      .load().count() == 50L)
    // metadata tables time-travel through tags too
    assert(spark.sql(
        s"SELECT sum(row_count) FROM $cat.`t$$files` VERSION AS OF 'golden'")
      .head().getLong(0) == 50L)
    // tags work as incremental/change-feed range endpoints too
    assert(spark.read.format("graft-manifest")
      .option("path", s"$root/t").option("changesFrom", "golden")
      .load().count() == 30L)
    assert(spark.read.format("graft-manifest")
      .option("path", s"$root/t").option("changeFeed", "true")
      .option("changesFrom", "golden").load()
      .collect().forall(r => r.getAs[String]("_change_type") == "insert" &&
        r.getAs[Long]("k") >= 50))
    val dup = intercept[Exception] {
      spark.sql(s"CALL $cat.system.create_tag('t', 'golden', 3)").collect()
    }
    assert(dup.getMessage.contains("already names version 2"), dup.getMessage)
    val num = intercept[Exception] {
      spark.sql(s"CALL $cat.system.create_tag('t', '7')").collect()
    }
    assert(num.getMessage.contains("non-numeric"), num.getMessage)
    val unknown = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 'nope'").collect()
    }
    assert(unknown.getMessage.contains("golden"), unknown.getMessage)
    spark.sql(s"CALL $cat.system.drop_tag('t', 'golden')")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 'golden'").collect()
    }
  }

  test("$refs metadata table lists tags and branches with fork points") {
    val (cat, _) = freshCat("refs")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")          // v1
    ins(cat, 0, 10)                                       // v2
    spark.sql(s"CALL $cat.system.create_tag('t', 'golden')")
    spark.sql(s"CALL $cat.system.create_branch('t', 'wip')")
    spark.range(0, 5).select($"id".as("k"))
      .write.mode("append").format("graft-manifest")
      .option("path", spark.conf.get(s"spark.sql.catalog.$cat.root") + "/t")
      .option("branch", "wip").save()
    val refs = spark.table(s"$cat.`t$$refs`").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
    // branch chains share main's numbering: fork twin v2, staged v3
    assert(refs == Set(("golden", "tag", 2, -1), ("wip", "branch", 3, 2)))
  }

  test("ALTER TABLE RENAME moves the whole history; refs and time " +
    "travel survive; reserved/occupied names refuse") {
    val (cat, _) = freshCat("ren")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")          // v1
    ins(cat, 0, 25)                                       // v2
    spark.sql(s"CALL $cat.system.create_tag('t', 'keep')")
    ins(cat, 25, 40)                                      // v3
    spark.sql(s"ALTER TABLE $cat.t RENAME TO t2")
    assert(spark.table(s"$cat.t2").count() == 40L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t2 VERSION AS OF 'keep'")
      .head().getLong(0) == 25L)
    intercept[Exception] { spark.table(s"$cat.t").collect() }
    // occupied target refuses
    spark.sql(s"CREATE TABLE $cat.other (x BIGINT)")
    val occ = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t2 RENAME TO other")
    }
    assert(occ.getMessage.toLowerCase.contains("exists"), occ.getMessage)
    // a live table's reserved metadata names refuse as targets
    val res = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t2 RENAME TO `other$$files`")
    }
    assert(res.getMessage.contains("reserved"), res.getMessage)
  }

  test("vacuum never expires a tagged version; dropping the tag " +
    "releases it") {
    val (cat, _) = freshCat("vac")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")          // v1
    ins(cat, 0, 10)                                       // v2
    spark.sql(s"CALL $cat.system.create_tag('t', 'keep', 2)")
    ins(cat, 10, 30)                                      // v3
    ins(cat, 30, 60)                                      // v4
    val v1 = spark.sql(s"CALL $cat.system.vacuum('t', 1)").collect()
    // v1 and v3 dropped; v2 pinned by the tag, v4 is the retained tip
    assert(v1.head.getInt(0) == 2, s"dropped ${v1.head.getInt(0)} versions")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 'keep'")
      .head().getLong(0) == 10L)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 3").collect()
    }
    // the tagged version's DATA files survived too: full read works
    assert(spark.table(s"$cat.t").count() == 60L)
    spark.sql(s"CALL $cat.system.drop_tag('t', 'keep')")
    val v2 = spark.sql(s"CALL $cat.system.vacuum('t', 1)").collect()
    assert(v2.head.getInt(0) == 1)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 2").collect()
    }
    assert(spark.table(s"$cat.t").count() == 60L)
  }
}
