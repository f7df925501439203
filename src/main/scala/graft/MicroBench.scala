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

    // Shuffle bytes written per run — locally a shuffle is a memcpy, so
    // wall-clock hides exchange-volume wins; bytes are what a network
    // shuffle pays for at cluster scale.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def shuffled(f: => Long): (Double, Long) = {
      shuffleBytes.set(0L)
      val dt = time(f)
      (dt, Drain.untilStable(shuffleBytes.get()))
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

    // row path measured with the columnar kernel gated OFF — otherwise
    // the injectColumnar rule would claim this projection over the
    // columnar cache scan and both numbers would measure the kernel
    spark.conf.set("spark.graft.columnar.enabled", "false")
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

    // --- cosine: the round-10 batch kernel (injectColumnar) over the
    // SAME cached data — ColumnarKernelProjectExec scores batches of
    // array<float> vectors with zero row materialization below the
    // single ColumnarToRow transition; ColumnarKernelSpec pins
    // bit-equality, this pins it is not slower than the row path.
    spark.conf.set("spark.graft.columnar.enabled", "true")
    val viaKernel = time {
      vecs.select(cosine($"a", $"b").as("c")).filter($"c" > 2.0).count() + 1
    }
    vecs.unpersist()

    // --- top-k: custom operator vs window over 8M rows, 1k keys ---------
    // Both plans prune the exchange to ≤ 16·3·1k records: the custom
    // operator via its partial heaps, the window via Spark 4's own
    // WindowGroupLimit rewrite of `row_number() <= k` (SPARK-37099, absent
    // in the reference's 2.1). The bytes metrics below pin that parity —
    // a regression in either path's pre-exchange pruning shows up here.
    val rows = spark.range(0, 8_000_000, 1, 16)
      .select(pmod($"id", lit(1_000)).as("k"),
        pmod($"id" * 2654435761L, lit(1_000_003)).as("v"))
      .cache()
    rows.count()

    val (viaTopK, topKBytes) = shuffled {
      TopK.perKey(rows, Seq("k"), Seq(TopK.desc("v")), 3).count()
    }
    val w = Window.partitionBy($"k").orderBy($"v".desc)
    val (viaWindow, windowBytes) = shuffled {
      rows.withColumn("rn", row_number().over(w)).filter($"rn" <= 3).count()
    }
    rows.unpersist()

    // --- ngrams: streaming Generator vs materialize-array-then-explode --
    // 200k docs × 200 tokens; the generator streams 198 trigram rows per
    // doc through GenerateExec while the declarative idiom first builds a
    // 198-element array per row.
    val docs = spark.range(0, 200_000, 1, 16)
      .select($"id", transform(sequence(lit(0), lit(199)),
        i => concat(lit("w"), pmod($"id" + i, lit(4093)))).as("words"))
      .cache()
    docs.count()

    val viaGen = time {
      docs.select(graft.functions.NGramGenerator.ngrams($"words", 3).as("g"))
        .filter(length($"g") > 100).count() + 1
    }
    val viaExplode = time {
      docs.select(explode(transform(sequence(lit(1), size($"words") - 2),
        i => concat_ws(" ", element_at($"words", i),
          element_at($"words", i + 1), element_at($"words", i + 2)))).as("g"))
        .filter(length($"g") > 100).count() + 1
    }
    docs.unpersist()

    println(s"""{"metric":"microbench","unit":"sec","cosine_expr":$viaExpr,"cosine_udf":$viaUdf,"cosine_kernel":$viaKernel,"topk_custom":$viaTopK,"topk_window":$viaWindow,"topk_custom_shuffle_bytes":$topKBytes,"topk_window_shuffle_bytes":$windowBytes,"ngram_generator":$viaGen,"ngram_explode":$viaExplode}""")
    spark.stop()
  }
}
