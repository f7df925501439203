package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NGramGenerator.ngrams

/** NGramGenerator (custom Generator/UDTF): agreement with the
  * declarative transform+explode idiom on real text, edge cases (short
  * inputs, n=1), and the Generate plan shape. */
class NGramGeneratorSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  test("matches the transform+explode formulation on documents") {
    import spark.implicits._
    val words = split(lower($"text"), " ")
    val docs = Tables.df(spark, dir, "documents")
    val viaGen = docs.select(ngrams(words, 2).as("ngram"))
      .groupBy($"ngram").count()
    val viaExplode = docs.select(explode(
      when(size(words) >= 2,
        transform(sequence(lit(1), size(words) - 1),
          i => concat_ws(" ", element_at(words, i), element_at(words, i + 1))))
        .otherwise(expr("array()").cast("array<string>"))).as("ngram"))
      .groupBy($"ngram").count()
    assert(viaGen.exceptAll(viaExplode).isEmpty && viaExplode.exceptAll(viaGen).isEmpty)
  }

  test("short arrays and n=1 edge cases") {
    import spark.implicits._
    val df = Seq(Seq("a", "b", "c"), Seq("a"), Seq.empty[String])
      .toDF("words")
    assert(df.select(ngrams($"words", 3).as("g")).as[String].collect().toSeq
      == Seq("a b c"))
    assert(df.select(ngrams($"words", 1).as("g")).as[String].collect().sorted.toSeq
      == Seq("a", "a", "b", "c"))
    assert(df.select(ngrams($"words", 4).as("g")).count() == 0)
  }

  test("NGramSimplification rewrites ngrams(words, 1) to codegen explode") {
    import spark.implicits._
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev :+ graft.functions.NGramSimplification
    try {
      // split() output declares containsNull=false → rewrite fires.
      val df = spark.range(1)
        .select(ngrams(split(lit("a b c"), " "), 1).as("g"))
      assert(df.queryExecution.optimizedPlan.toString.contains("explode"),
        df.queryExecution.optimizedPlan.toString)
      assert(df.as[String].collect().sorted.toSeq == Seq("a", "b", "c"))
      // n >= 2 must be left alone
      val df2 = spark.range(1)
        .select(ngrams(split(lit("a b"), " "), 2).as("g"))
      assert(df2.queryExecution.optimizedPlan.toString.contains("ngrams"))
      assert(df2.as[String].collect().toSeq == Seq("a b"))
      // containsNull=true input (Scala-encoded array): the nullability
      // guard must block the rewrite — it would loosen the contract.
      val df3 = Seq(Seq("a", "b")).toDF("words")
        .select(ngrams($"words", 1).as("g"))
      assert(df3.queryExecution.optimizedPlan.toString.contains("ngrams"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("plans through Generate (not a UDF or array materialization)") {
    import spark.implicits._
    val df = Tables.df(spark, dir, "documents")
      .select(ngrams(split(lower($"text"), " "), 3).as("ngram"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan.take(500))
  }
}
