package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier

import graft.sources.GraftManifestCatalog

/** Resolution for GOVERNED VIEWS (round 14): expands `cat.v` (and
  * `cat.v VERSION AS OF n`, which reads definition version n) into the
  * view's stored SQL, parsed and aliased — the engine-side half of the
  * `ViewCatalog` the GraftManifestCatalog implements, wired through
  * `SparkSessionExtensions.injectResolutionRule` because Spark 4.1
  * ships the interface without a consumer (the reference's 2.1 views,
  * `sql/core/.../command/views.scala`, are session-catalog-only and
  * versionless). The rule runs inside the analyzer's resolution
  * fixpoint, so view-over-view definitions expand recursively and the
  * inner SQL's own `VERSION AS OF` over manifest TABLES composes
  * untouched. Only identifiers whose head names a GraftManifestCatalog
  * with a matching `_VIEW` chain are touched; everything else —
  * including every table read — passes through at the cost of one
  * existence probe for two-part names on our catalogs. */
case class ResolveGovernedViews(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def viewOf(parts: Seq[String]):
      Option[(GraftManifestCatalog, Identifier)] =
    if (parts.length != 2) None
    else (try Some(spark.sessionState.catalogManager.catalog(parts.head))
          catch { case _: Exception => None }) match {
      case Some(c: GraftManifestCatalog) =>
        val ident = Identifier.of(Array.empty, parts(1))
        if (c.viewExists(ident)) Some((c, ident)) else None
      case _ => None
    }

  /** Evaluates the existence probe ONCE per matched node (the guard
    * and the body would otherwise each pay a catalog lookup plus a
    * `_VIEW.*` listStatus round-trip). */
  private object GovernedViewRef {
    def unapply(p: LogicalPlan):
        Option[(GraftManifestCatalog, Identifier, String)] = p match {
      case u: UnresolvedRelation =>
        viewOf(u.multipartIdentifier)
          .map { case (c, i) => (c, i, u.multipartIdentifier.head) }
      case _ => None
    }
  }

  private def expand(cat: GraftManifestCatalog, catName: String,
      ident: Identifier, version: Option[Int]): LogicalPlan = {
    val view = cat.loadViewAt(ident, version)
    // parseQuery, not parsePlan: stored bodies are create-time-validated
    // queries, and re-validating here keeps a hand-edited _VIEW file
    // from smuggling a command into every reader's plan
    val parsed = spark.sessionState.sqlParser.parseQuery(view.query)
    val aliased =
      if (view.columnAliases == null || view.columnAliases.isEmpty) parsed
      else org.apache.spark.sql.catalyst.analysis
        .UnresolvedSubqueryColumnAliases(
          view.columnAliases.toIndexedSeq, parsed)
    SubqueryAlias(Seq(catName, ident.name), aliased)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case RelationTimeTravel(GovernedViewRef(cat, ident, catName), ts, ver)
          if ts.isEmpty && ver.exists(_.toIntOption.isDefined) =>
        // VERSION AS OF n on a VIEW = the definition current at view
        // version n (the table-time-travel twin for definitions)
        expand(cat, catName, ident, Some(ver.get.toInt))
      case RelationTimeTravel(GovernedViewRef(_, ident, _), ts, ver)
          if ts.isDefined || ver.isDefined =>
        throw new IllegalArgumentException(
          s"governed view '${ident.name}' supports VERSION AS OF " +
            "<definition version> only — TIMESTAMP AS OF and named " +
            "refs do not apply to view definitions")
      case GovernedViewRef(cat, ident, catName) =>
        expand(cat, catName, ident, None)
    }
}
