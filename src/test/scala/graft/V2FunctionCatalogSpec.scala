package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctionCatalog

/** DSv2 FunctionCatalog seam (V2Functions.scala): SQL resolves
  * `graft_fns.fn.*` through the catalog plugin; the scalar binds via the
  * MAGIC_METHOD (`invoke(long,long)`) path and the aggregate runs a real
  * partial→merge plan. Equivalence is checked against Spark's own
  * built-ins (`bit_count`, `^`, `bit_xor`) over a multi-partition input so
  * the merge contract is actually exercised. */
class V2FunctionCatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = GraftSession.local(4)
    s.conf.set("spark.sql.catalog.graft_fns",
      classOf[GraftFunctionCatalog].getName)
    s
  }

  test("catalog lists and loads its functions; unknowns are errors") {
    val cat = new GraftFunctionCatalog
    cat.initialize("graft_fns", CaseInsensitiveStringMap.empty())
    val names = cat.listFunctions(Array("fn")).map(_.name).toSet
    assert(names == Set("hamming64", "xor64"))
    assert(cat.functionExists(Identifier.of(Array("fn"), "hamming64")))
    assert(!cat.functionExists(Identifier.of(Array("fn"), "nope")))
    intercept[AnalysisException](cat.loadFunction(Identifier.of(Array("fn"), "nope")))
    intercept[AnalysisException](cat.listFunctions(Array("other_ns")))
  }

  test("scalar + aggregate resolve from SQL and match built-in formulation " +
    "across a multi-partition shuffle") {
    import spark.implicits._
    (1L to 10000L).map(i => (i * 2654435761L, i * 40503L, i % 7))
      .toDF("a", "b", "g")
      .repartition(13)
      .createOrReplaceTempView("v2_fn_input")

    val v2 = spark.sql(
      """SELECT g, graft_fns.fn.xor64(a) AS key_xor,
                CAST(SUM(graft_fns.fn.hamming64(a, b)) AS BIGINT) AS hd_sum
         FROM v2_fn_input GROUP BY g ORDER BY g""").collect()
    val builtin = spark.sql(
      """SELECT g, bit_xor(a) AS key_xor,
                CAST(SUM(bit_count(a ^ b)) AS BIGINT) AS hd_sum
         FROM v2_fn_input GROUP BY g ORDER BY g""").collect()
    assert(v2.toSeq == builtin.toSeq)
    assert(v2.length == 7)
  }

  test("the magic-method Invoke path is what the analyzer binds (no row " +
    "boxing in the scalar hot path)") {
    val df = spark.sql("SELECT graft_fns.fn.hamming64(id, id + 3) AS h " +
      "FROM range(5)")
    // MagicMethod binding renders as Invoke(..., invoke, ...); the
    // interpreted fallback would render as ApplyFunctionExpression.
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("invoke"), analyzed)
    assert(!analyzed.contains("ApplyFunctionExpression"), analyzed)
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2, 2, 3, 2, 2))
  }

  test("bind-time type gate rejects wrong argument types at analysis") {
    val e = intercept[Exception](spark.sql(
      "SELECT graft_fns.fn.hamming64(array(1), array(2))").collect())
    assert(e.getMessage.contains("hamming64"), e.getMessage)
  }
}
