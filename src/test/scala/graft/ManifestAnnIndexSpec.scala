package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, Tables}

/** GOVERNED ANN INDEX (round 13): the LSH bucket relation lives as a
  * manifest table, maintained INCREMENTALLY from the corpus's change
  * feed — a takedown lands on the corpus as KB-scale delete metadata,
  * the feed surfaces exactly the deleted rows, and the index drops only
  * those; inserts append their bucket rows. Queries join the index on
  * bucket, fetch only candidate vectors, and kernel-score — the corpus
  * never rescans for maintenance and never shuffles for queries. */
class ManifestAnnIndexSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def freshCat(tag: String): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_ann_$tag").toString
    val cat = s"graft_ann_${tag}_" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  test("takedowns propagate corpus→index through the change feed with " +
    "NO corpus rescan; queries through the index match the brute-force " +
    "answer over the live corpus") {
    val (cat, root) = freshCat("e2e")
    val emb = Tables.df(spark, sf, "embeddings")
    spark.sql(s"CREATE TABLE $cat.docs (vec_id BIGINT, " +
      "embedding ARRAY<FLOAT>) TBLPROPERTIES('delete.mode'='merge-on-read')")
    emb.select($"vec_id", $"embedding").writeTo(s"$cat.docs").append() // v2
    spark.sql(s"CREATE TABLE $cat.idx (bucket INT, vec_id BIGINT)")
    // initial build: one map-side hash pass
    graft.api.Graft.lshIndex(spark.table(s"$cat.docs"), "vec_id",
      "embedding", planes = 4, seed = 7L)
      .writeTo(s"$cat.idx").append()
    var consistentWith = 2
    val n0 = spark.table(s"$cat.idx").count()
    assert(n0 == spark.table(s"$cat.docs").count())

    // TAKEDOWN: MOR delete (positional vectors — zero vector bytes
    // rewritten), then maintenance consumes ONLY the feed
    spark.sql(s"DELETE FROM $cat.docs WHERE vec_id % 17 = 3")   // v3
    consistentWith = graft.api.Graft.maintainLshIndex(spark, cat,
      "docs", "idx", "vec_id", "embedding", consistentWith,
      planes = 4, seed = 7L)
    assert(consistentWith == 3)
    assert(spark.table(s"$cat.idx")
      .filter($"vec_id" % 17 === 3).count() == 0L,
      "deleted docs must leave the index")
    // index == freshly-built index over the live corpus, exactly
    val rebuilt = graft.api.Graft.lshIndex(spark.table(s"$cat.docs"),
      "vec_id", "embedding", planes = 4, seed = 7L)
    assert(spark.table(s"$cat.idx").exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(spark.table(s"$cat.idx")).isEmpty,
      "incremental maintenance must equal the full rebuild")

    // queries through the GOVERNED index == direct LSH over the live
    // corpus (bit-identical buckets, same scoring)
    val queries = emb.filter($"vec_id" < 10)
    val viaIndex = graft.api.Graft.lshIndexNeighbors(
      spark.table(s"$cat.docs"), spark.table(s"$cat.idx"), queries,
      "vec_id", "embedding", "vec_id", "embedding", k = 3,
      planes = 4, seed = 7L)
    val direct = graft.api.Graft.lshNeighbors(
      spark.table(s"$cat.docs"), queries,
      "vec_id", "embedding", "vec_id", "embedding", k = 3,
      planes = 4, seed = 7L)
    assert(viaIndex.exceptAll(direct).isEmpty &&
      direct.exceptAll(viaIndex).isEmpty)

    // INSERTS: append fresh docs, maintain, find them
    spark.range(900000, 900005).select($"id".as("vec_id"),
        transform(sequence(lit(0), lit(31)),
          i => ($"id" % 7 + i).cast("float") / 40f).as("embedding"))
      .writeTo(s"$cat.docs").append()                            // v4
    consistentWith = graft.api.Graft.maintainLshIndex(spark, cat,
      "docs", "idx", "vec_id", "embedding", consistentWith,
      planes = 4, seed = 7L)
    assert(consistentWith == 4)
    assert(spark.table(s"$cat.idx")
      .filter($"vec_id" >= 900000L).count() == 5L)
    // a no-op maintenance pass is version-free
    assert(graft.api.Graft.maintainLshIndex(spark, cat, "docs", "idx",
      "vec_id", "embedding", consistentWith) == consistentWith)

    // the INDEX is governed too: its history time-travels
    val idxDir = new org.apache.hadoop.fs.Path(root, "idx")
    val fsI = idxDir.getFileSystem(spark.sessionState.newHadoopConf())
    assert(ManifestFiles.versions(fsI, idxDir).size >= 4)
  }

  test("upsert corpora maintain too: the value-keyed delete legs drop " +
    "stale bucket rows, the insert legs land fresh ones") {
    val (cat, _) = freshCat("up")
    val emb = Tables.df(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").limit(200).cache()
    spark.sql(s"CREATE TABLE $cat.docs (vec_id BIGINT, " +
      "embedding ARRAY<FLOAT>) TBLPROPERTIES('delete.mode'='merge-on-read')")
    emb.writeTo(s"$cat.docs").append()                           // v2
    spark.sql(s"CREATE TABLE $cat.idx (bucket INT, vec_id BIGINT)")
    graft.api.Graft.lshIndex(spark.table(s"$cat.docs"), "vec_id",
      "embedding").writeTo(s"$cat.idx").append()
    // CDC upsert: re-embed 20 docs (shifted vectors → likely new buckets)
    val reembedded = emb.filter($"vec_id" < 20)
      .select($"vec_id", transform($"embedding", x => -x).as("embedding"))
    reembedded.coalesce(1).write.mode("append").format("graft-manifest")
      .option("path", spark.conf.get(s"spark.sql.catalog.$cat.root") + "/docs")
      .option("upsertKeys", "vec_id").save()                    // v3
    graft.api.Graft.maintainLshIndex(spark, cat, "docs", "idx",
      "vec_id", "embedding", 2)
    // exactly one index row per doc, and the re-embedded ones carry the
    // NEW vector's bucket
    val idx = spark.table(s"$cat.idx")
    assert(idx.groupBy($"vec_id").count().filter($"count" =!= 1).count() == 0L)
    val rebuilt = graft.api.Graft.lshIndex(spark.table(s"$cat.docs"),
      "vec_id", "embedding")
    assert(idx.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(idx).isEmpty)
    emb.unpersist()
  }
}
