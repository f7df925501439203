package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Literal
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

  private def expand(cat: GraftManifestCatalog, catName: String,
      ident: Identifier, version: Option[Int]): LogicalPlan = {
    val view = cat.loadViewAt(ident, version)
    val parsed = spark.sessionState.sqlParser.parsePlan(view.query)
    SubqueryAlias(Seq(catName, ident.name), parsed)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case RelationTimeTravel(u: UnresolvedRelation, ts, Some(v))
          if ts.isEmpty && v.toIntOption.isDefined &&
            viewOf(u.multipartIdentifier).isDefined =>
        val (cat, ident) = viewOf(u.multipartIdentifier).get
        expand(cat, u.multipartIdentifier.head, ident, Some(v.toInt))
      case RelationTimeTravel(u: UnresolvedRelation, Some(Literal(v, _)), None)
          if viewOf(u.multipartIdentifier).isDefined &&
            v != null && v.toString.toIntOption.isDefined =>
        // `VERSION AS OF <int>` can surface as a literal expression
        val (cat, ident) = viewOf(u.multipartIdentifier).get
        expand(cat, u.multipartIdentifier.head, ident,
          Some(v.toString.toInt))
      case u: UnresolvedRelation if viewOf(u.multipartIdentifier).isDefined =>
        val (cat, ident) = viewOf(u.multipartIdentifier).get
        expand(cat, u.multipartIdentifier.head, ident, None)
    }
}
