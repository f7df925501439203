package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{NGramGenerator, TopKLabels}
import graft.functions.VectorExpressions.{CosineSimilarity, Hamming64, MinHashSignature, SimHash64}

/** The deployment-grade extension seam (reference counterpart: the fork
  * wires its operators into `SparkStrategies`/`FunctionRegistry` at build
  * time; the public Spark API for the same is `SparkSessionExtensions` —
  * `sql/core/.../SparkSessionExtensions.scala`):
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * makes every custom component available with no code changes: the
  * TopKPerKey planner strategy, and the codegen'd expressions as SQL
  * functions (`cosine`, `hamming64`, `simhash64`, `minhash_sig`,
  * `ngrams`, `top_k_labels`) — so pure-SQL users (JDBC/thrift, notebook
  * SQL cells) reach the same kernels the Scala DSL uses. ExtensionsSpec
  * proves the wiring in a fresh JVM with only the conf set.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def lit[T](e: Expression, what: String): T = e match {
    case Literal(v, _) => v.asInstanceOf[T]
    case other => throw new IllegalArgumentException(
      s"$what must be a literal, got $other")
  }
  private def int(e: Expression, what: String): Int =
    lit[Number](e, what).intValue()
  private def long(e: Expression, what: String): Long =
    lit[Number](e, what).longValue()

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.GraftExtensions", "", name, usage, "", "", "", "", "", "", "built-in"),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.functions.NGramSimplification)
    // DEDUP TABLE statement: parser seam + the analyzer rule that
    // desugars its unresolved node (DedupStatement.scala).
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    ext.injectResolutionRule(_ => graft.plans.ResolveDedupTable)
    // GOVERNED VIEWS (round 14): expand `cat.v [VERSION AS OF n]` from
    // the _VIEW.v<N> definition chain (plans/GovernedViews.scala) —
    // Spark 4.1 ships ViewCatalog without an engine consumer.
    ext.injectResolutionRule(s => graft.plans.ResolveGovernedViews(s))
    // MATERIALIZED-VIEW query rewriting (round 14): resolved aggregates
    // over governed sources answer from exactly-consistent MVs
    // (plans/MvRewrite.scala); SET spark.graft.mv.rewrite=false disables.
    ext.injectPostHocResolutionRule(s => graft.plans.MvRewrite(s))
    // SHREDDED-VARIANT file skipping (round 16): comparable variant_get
    // conjuncts lift into manifest relation options, where the scan
    // prunes files against declared shred-path bounds (ManifestShred).
    ext.injectOptimizerRule(s => graft.sources.VariantSkipRule(s))
    // Columnar kernel: hamming64 projections over columnar children run
    // batch-at-a-time (ColumnarKernel.scala).
    ext.injectColumnar(_ => graft.plans.GraftColumnarRule)
    // Opt-in plan guardrails (SET spark.graft.guard=true): reject
    // unbounded cartesians / unpartitioned windows at analysis
    // (Guardrails.scala).
    ext.injectCheckRule(s => new graft.plans.GraftGuardrails(s))

    ext.injectFunction(fn("cosine",
      "cosine(a, b) - cosine similarity of two float/double arrays") {
      es => CosineSimilarity(es(0), es(1))
    })
    ext.injectFunction(fn("hamming64",
      "hamming64(a, b) - Hamming distance between two int64 fingerprints") {
      es => Hamming64(es(0), es(1))
    })
    ext.injectFunction(fn("simhash64",
      "simhash64(words) - 64-bit SimHash fingerprint of a token array") {
      es => SimHash64(es(0))
    })
    ext.injectFunction(fn("minhash_sig",
      "minhash_sig(words, k, shingleSize, seed) - MinHash signature") {
      es => MinHashSignature(es(0), int(es(1), "k"),
        int(es(2), "shingleSize"), long(es(3), "seed"))
    })
    ext.injectFunction(fn("ngrams",
      "ngrams(words, n) - generator emitting one row per word n-gram") {
      es => NGramGenerator(es(0), int(es(1), "n"))
    })
    ext.injectFunction(fn("top_k_labels",
      "top_k_labels(value, label, k) - labels of the k largest values") {
      es => TopKLabels(es(0), es(1), int(es(2), "k"))
    })
  }
}
