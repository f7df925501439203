package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** dedupClusters invariants: every candidate pair lands in one cluster,
  * the canonical id is the cluster minimum, and synthetic exact near-dups
  * are found by the full MinHash→LSH→CC pipeline. */
class DedupClusterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("synthetic near-duplicates cluster together through the full pipeline") {
    import spark.implicits._
    // 20 distinct docs + near-identical variants of doc 0 and doc 1
    val base = (0 until 20).map { i =>
      (i.toLong, (0 until 60).map(w => s"w${(w * (i + 3)) % 211}").mkString(" "))
    }
    val variants = Seq(
      (100L, base(0)._2.replaceFirst("w0", "xx")),
      (101L, base(1)._2 + " extra token"))
    val docs = (base ++ variants).toDF("doc_id", "text")

    val candidates = graft.api.Graft.minHashCandidates(
      docs, "doc_id", "text", numHashes = 128, bands = 32, threshold = 0.5)
    val pairs = candidates.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((0L, 100L)), s"missing (0,100) in $pairs")
    assert(pairs.contains((1L, 101L)), s"missing (1,101) in $pairs")

    val clusters = graft.api.Graft.dedupClusters(candidates).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(100L) == clusters(0L))
    assert(clusters(101L) == clusters(1L))
    // canonical = min id of the cluster
    assert(clusters(0L) == 0L && clusters(1L) == 1L)
  }

  test("bucket-size cap bounds boilerplate cliques but keeps real near-dups") {
    import spark.implicits._
    val boiler = (0 until 50).map(i =>
      (1000L + i, "same same " + (0 until 40).map(w => s"b$w").mkString(" ")))
    val distinctDoc = (0 until 40).map(w => s"d$w").mkString(" ")
    val pairDocs = Seq((1L, distinctDoc), (2L, distinctDoc + " tail"))
    val docs = (boiler ++ pairDocs).toDF("doc_id", "text")

    val capped = graft.api.Graft.minHashCandidates(
      docs, "doc_id", "text", numHashes = 128, bands = 32,
      threshold = 0.5, maxBucketSize = 10)
    val pairs = capped.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)), "real near-dup must survive the cap")
    assert(!pairs.exists(p => p._1 >= 1000L && p._2 >= 1000L),
      "50-doc boilerplate clique must be excluded by the bucket cap")
  }

  test("exactJaccardPairs equals the all-pairs formulation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.df(spark, "/root/testdata/sf0.001", "documents")
    val viaIndex = graft.api.Graft.exactJaccardPairs(
        docs, "doc_id", "text", threshold = 0.05, groupCol = Some("lang"))
      .select($"doc_a", $"doc_b", round($"jaccard", 9).as("j"))
    val sh = graft.api.Graft.shingleSets(docs, "doc_id", "text")
      .join(docs.select($"doc_id", $"lang"), "doc_id")
    val viaAllPairs = sh.as("a").join(sh.as("b"), "lang")
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        round(size(array_intersect($"a.shingles", $"b.shingles"))
          .cast("double") /
          size(array_union($"a.shingles", $"b.shingles")), 9).as("j"))
      .filter($"j" >= 0.05)
    assert(viaIndex.exceptAll(viaAllPairs).isEmpty &&
      viaAllPairs.exceptAll(viaIndex).isEmpty)
    assert(viaIndex.count() > 0, "threshold must select real pairs")
  }

  test("DataFrame CC equals GraphX connectedComponents on an adversarial graph") {
    import spark.implicits._
    // Chains (deep diameter — exercises pointer jumping), a clique, a star,
    // isolated pairs, and duplicate/reversed candidate rows.
    val chain = (0 until 40).map(i => (i.toLong, i + 1L))            // 0..40
    val clique = for (a <- 100 to 110; b <- (a + 1) to 110)
      yield (a.toLong, b.toLong)
    val star = (1 to 15).map(i => (200L, 200L + i))
    val dupes = Seq((0L, 1L), (1L, 0L), (300L, 301L), (300L, 301L))
    val pairs = (chain ++ clique ++ star ++ dupes).toDF("doc_a", "doc_b")

    val df = graft.api.Graft.dedupClusters(pairs)
    val gx = graft.api.Graft.dedupClustersGraphX(pairs)
    assert(df.exceptAll(gx).isEmpty && gx.exceptAll(df).isEmpty,
      "DataFrame CC and GraphX CC must assign identical (doc_id, canonical_id)")
    val labels = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 to 40).forall(i => labels(i.toLong) == 0L), "chain collapses to 0")
    assert((100 to 110).forall(i => labels(i.toLong) == 100L))
    assert((200 to 215).forall(i => labels(i.toLong) == 200L))
  }

  test("CC loop submits exactly 2 jobs per round (AQE off)") {
    import spark.implicits._
    val perDesc = new java.util.concurrent.ConcurrentHashMap[String, Integer]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val d = js.properties.getProperty("spark.job.description")
        if (d != null && d.startsWith("graft CC"))
          perDesc.merge(d, 1, (a, b) => a + b)
      }
    }
    // AQE splits one action into a job per query stage, and each broadcast
    // join's build side runs as its own job — both would make the count
    // config-dependent. With AQE off and broadcasts off (sort-merge joins
    // only), actions == jobs and the 2-jobs-per-round contract (checkpoint
    // of the neighbor-min step + the convergence count that doubles as the
    // cache-materializing action) is directly observable.
    spark.sparkContext.addSparkListener(listener)
    try Confs.withValues(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val chain = (0 until 48).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")
      graft.api.Graft.dedupClusters(chain) // loop materializes internally
      Drain.untilStable(perDesc.values.toString.hashCode.toLong)
    } finally spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    val rounds = perDesc.asScala.filter(_._1.startsWith("graft CC round"))
    assert(rounds.nonEmpty, s"no labeled CC rounds observed: $perDesc")
    assert(rounds.values.forall(_ == 2),
      s"every round must submit exactly 2 jobs: $rounds")
    assert(perDesc.asScala.getOrElse("graft CC init", 0: Integer) == 2,
      s"init = edges checkpoint + label-init checkpoint: $perDesc")
  }

  test("bucket cap plans as hash-aggregate + anti-join, not a window sort") {
    import spark.implicits._
    val docs = (0 until 10).map(i =>
      (i.toLong, (0 until 30).map(w => s"w${(w + i) % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    val plan = graft.api.Graft.minHashCandidates(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "cap must not force a per-partition sort of the banded triples")
    assert(plan.contains("HashAggregate"), plan.take(400))
  }
}
