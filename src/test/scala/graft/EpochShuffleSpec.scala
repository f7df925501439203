package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialization path behind q223's epoch reshuffle: at scale the
  * per-epoch order is written shard-by-shard via
  * `repartitionByRange(k).sortWithinPartitions(k)`. Pins the three
  * properties the 100 TB argument rests on:
  *
  *   1. the md5 permutation key range-partitions EVENLY (uniform key ⇒
  *      no straggler shard),
  *   2. every shard is internally sorted and shard ranges don't overlap
  *      (concatenating shards in partition order IS the global order —
  *      no merge step),
  *   3. different epochs produce genuinely different, decorrelated
  *      permutations while each epoch is bit-reproducible.
  */
class EpochShuffleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val dir = "/root/testdata/sf0.001"

  private def permuted(epoch: Int, shards: Int) = {
    import spark.implicits._
    Tables.df(spark, dir, "documents").select($"doc_id")
      .withColumn("k", md5(concat(lit(epoch.toString), lit(":"),
        $"doc_id".cast("string"))))
      .repartitionByRange(shards, $"k")
      .sortWithinPartitions($"k")
  }

  test("range partitioning by the md5 key is balanced and shards are " +
    "sorted, non-overlapping") {
    import spark.implicits._
    val shards = 8
    val df = permuted(0, shards)
    val perPart = df
      .select(spark_partition_id().as("p"), $"k")
      .groupBy($"p")
      .agg(count(lit(1)).as("n"), min($"k").as("lo"), max($"k").as("hi"))
      .orderBy($"p")
      .collect()
    assert(perPart.length == shards)
    val counts = perPart.map(_.getLong(1))
    // uniform key ⇒ largest shard within 2x of smallest at n=500
    assert(counts.max <= 2 * math.max(1L, counts.min),
      counts.mkString(","))
    // shard key ranges strictly increase partition-to-partition
    val bounds = perPart.map(r => (r.getString(2), r.getString(3)))
    bounds.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"$hi1 !<= $lo2")
      case _ =>
    }
    // within-shard sortedness: k already sorted per partition
    val sortedInside = df
      .mapPartitions { it =>
        val ks = it.map(_.getString(1)).toSeq
        Iterator.single(ks == ks.sorted)
      }.collect()
    assert(sortedInside.forall(identity))
  }

  test("epochs decorrelate; each epoch is reproducible") {
    import spark.implicits._
    def order(epoch: Int): Seq[Long] =
      permuted(epoch, 4).select($"doc_id").collect().map(_.getLong(0)).toSeq
    val e0a, e0b = order(0)
    val e1 = order(1)
    assert(e0a == e0b, "epoch 0 must be bit-reproducible")
    assert(e0a != e1, "epochs must differ")
    assert(e0a.sorted == e1.sorted, "same corpus, different order")
    // decorrelation: the head of epoch 0 scatters across epoch 1
    val head0 = e0a.take(50).toSet
    val posIn1 = e1.zipWithIndex.filter(p => head0(p._1)).map(_._2)
    assert(posIn1.max - posIn1.min > e1.length / 4,
      s"head of epoch 0 stayed clustered in epoch 1: $posIn1")
  }
}
