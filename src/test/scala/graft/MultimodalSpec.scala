package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Pins the multimodal plumbing: stub-codec determinism, batch shape,
  * and frame-sampling stride arithmetic. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  test("stub codec is deterministic and byte-derived") {
    val payload = "hello world".getBytes("UTF-8")
    val (w1, h1, m1) = Multimodal.FakeCodec.decode(payload)
    val (w2, h2, m2) = Multimodal.FakeCodec.decode(payload)
    assert((w1, h1, m1) == (w2, h2, m2))
    assert(w1 == 64 + payload.length % 512)
    assert(h1 == 64 + (payload(0) & 0xff) % 512)
    assert(math.abs(m1 - payload.map(_ & 0xff).sum.toDouble / payload.length) < 1e-12)
    assert(Multimodal.FakeCodec.decode(Array.empty[Byte]) == ((0, 0, 0.0)))
  }

  test("decode runs partition-batched over every row") {
    val out = Multimodal.qDecode.run(spark, dir)
    val total = out.agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    val docs = Tables.df(spark, dir, "documents").count()
    assert(total == docs, "every media row must be decoded exactly once")
  }

  test("frame sampling keeps every 4th frame of 32-byte stride") {
    import spark.implicits._
    val rows = Multimodal.qFrameSample.run(spark, dir)
      .filter($"media_id" === 0L).collect()
    assert(rows.length == 1)
    val nChars = Tables.df(spark, dir, "documents")
      .filter($"doc_id" === 0L).select($"n_chars").collect()(0).getLong(0)
    val expected = ((nChars / 32) + 3) / 4 // ceil(nFrames / 4)
    assert(rows(0).getAs[Long]("n_sampled") == expected)
  }
}
