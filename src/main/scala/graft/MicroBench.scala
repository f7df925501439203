package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.cosine
import graft.plans.TopK

/** Micro-benchmarks backing the engine's design claims
  * (`sbt "runMain graft.MicroBench"`): codegen'd Catalyst cosine vs the
  * same math as a Scala UDF, and the custom two-phase top-k vs the
  * window row_number formulation, on synthetic data large enough to
  * swamp fixed overheads. Prints one JSON line.
  */
object MicroBench {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      math.min(16, Runtime.getRuntime.availableProcessors()))
    import spark.implicits._

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      require(n > 0); (System.nanoTime() - t0) / 1e9
    }

    // --- cosine: expression vs UDF over 2M 64-dim pairs -----------------
    val dim = 64
    val vecs = spark.range(0, 2_000_000, 1, 16)
      .select($"id",
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod($"id" + i, lit(997)) / 997.0).cast("float")).as("a"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod($"id" * 7 + i, lit(991)) / 991.0).cast("float")).as("b"))
      .cache()
    vecs.count() // materialize once so both variants read the same cache

    val viaExpr = time {
      vecs.select(cosine($"a", $"b").as("c")).filter($"c" > 2.0).count() + 1
    }
    val cosUdf = udf((a: Seq[Float], b: Seq[Float]) => {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    })
    val viaUdf = time {
      vecs.select(cosUdf($"a", $"b").as("c")).filter($"c" > 2.0).count() + 1
    }
    vecs.unpersist()

    // --- top-k: custom operator vs window over 8M rows, 100k keys -------
    val rows = spark.range(0, 8_000_000, 1, 16)
      .select(pmod($"id", lit(100_000)).as("k"),
        pmod($"id" * 2654435761L, lit(1_000_003)).as("v"))
      .cache()
    rows.count()

    val viaTopK = time {
      TopK.perKey(rows, Seq("k"), Seq(TopK.desc("v")), 3).count()
    }
    val w = Window.partitionBy($"k").orderBy($"v".desc)
    val viaWindow = time {
      rows.withColumn("rn", row_number().over(w)).filter($"rn" <= 3).count()
    }
    rows.unpersist()

    println(s"""{"metric":"microbench","unit":"sec","cosine_expr":$viaExpr,"cosine_udf":$viaUdf,"topk_custom":$viaTopK,"topk_window":$viaWindow}""")
    spark.stop()
  }
}
