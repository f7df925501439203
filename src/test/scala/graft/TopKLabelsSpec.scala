package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TopKAggregate, TopKLabels}

/** TopKLabels TypedImperativeAggregate: serde round-trip (including
  * labels past writeUTF's 64 KB ceiling), merge associativity with
  * compaction, and end-to-end equality against the row_number
  * formulation regardless of partitioning. */
class TopKLabelsSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  import org.apache.spark.sql.graft.ColumnBridge
  private val agg = TopKLabels(ColumnBridge.expression(lit(0.0)),
    ColumnBridge.expression(lit("")), 3)

  test("serialize/deserialize round-trips, including >64KB labels") {
    val big = "x" * 100000 // would throw UTFDataFormatException under writeUTF
    val buf = ArrayBuffer((1.5, "a"), (2.5, big), (0.5, "c"))
    val back = agg.deserialize(agg.serialize(buf.clone()))
    assert(back.sortBy(_._1) == buf.sortBy(_._1))
  }

  test("serialize compacts to at most k entries") {
    val buf = ArrayBuffer.tabulate(20)(i => (i.toDouble, s"l$i"))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.length == 3)
    assert(back.map(_._1).sorted(Ordering.Double.TotalOrdering.reverse)
      == Seq(19.0, 18.0, 17.0))
  }

  test("merge keeps the global top-k under (value desc, label desc)") {
    val a = ArrayBuffer((5.0, "a"), (3.0, "b"))
    val b = ArrayBuffer((5.0, "z"), (4.0, "c"), (1.0, "d"))
    val merged = agg.merge(a, b)
    val evaled = agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    assert(evaled.array.map(_.toString).toSeq == Seq("z", "a", "c"))
  }

  test("aggregate matches window top-k on sf0.001 across partitionings") {
    import spark.implicits._
    val cust = Tables.df(spark, dir, "customer")
    val expected = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_name".desc)
      cust.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
        .select($"c_mktsegment", $"rnk", $"c_name")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    }
    for (parts <- Seq(1, 7)) {
      val got = cust.repartition(parts)
        .groupBy($"c_mktsegment")
        .agg(TopKAggregate.topKLabels($"c_acctbal", $"c_name", 3).as("ls"))
        .select($"c_mktsegment", posexplode($"ls"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1) + 1, r.getString(2))).toSet
      assert(got == expected, s"partitions=$parts")
    }
  }
}
