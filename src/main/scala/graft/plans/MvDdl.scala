package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.IntegerType

import graft.sources.{GraftManifestCatalog, ManifestMaterializedView}

/** SQL DDL for INCREMENTAL MATERIALIZED VIEWS (round 16 — the missing
  * user surface over round 14-16's MV machinery): until now creation
  * went through the procedure's `func:expr:alias` string codec —
  * functional, but nobody writes dashboards in a bespoke mini-language.
  * Through the `injectParser` seam (the DEDUP statement's pattern):
  *
  *   CREATE MATERIALIZED VIEW <catalog>.<name> AS
  *     SELECT <keys…>, <agg AS alias…> FROM <cat>.<fact>
  *     [ [LEFT] JOIN <cat>.<dim> ON <cond> ]* [WHERE <filter>]
  *     GROUP BY <keys…>
  *   REFRESH MATERIALIZED VIEW <catalog>.<name>
  *   DROP MATERIALIZED VIEW <catalog>.<name>
  *
  * REFRESH/DROP desugar at parse time to the existing procedures
  * (`CALL <catalog>.system.refresh_materialized_view(…)`). CREATE keeps
  * the SELECT's text and becomes a [[CreateMaterializedViewCommand]]
  * that ANALYZES it at execution: the resolved plan must be an
  * Aggregate over a LEFT-DEEP join chain of same-catalog manifest
  * relations (the standard FROM order — the FIRST table is the FACT the
  * change-feed refresh follows, each later table a dimension pinned at
  * create), with group keys as bare columns and aggregates drawn from
  * count(*) / count / sum / avg / min / max. The pieces decompile to the
  * definition codec's bare-name SQL (qualifiers stripped — star MVs
  * require globally unique column names, so bare names are exact), and
  * [[ManifestMaterializedView.create]] runs unchanged — one surface, two
  * front doors, zero new semantics. Anything the MV algebra cannot
  * maintain incrementally (DISTINCT aggregates, expression group keys,
  * ORDER BY, subqueries, non-equi shapes the analyzer folds away)
  * REFUSES at CREATE time with the reason, never silently degrades. */
object MvDdl {

  private val CreateStmt =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\S+)\s+AS\s+(SELECT\b.+)""".r
  private val RefreshStmt =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\S+)\s*""".r
  private val DropStmt =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(\S+)\s*""".r

  import DdlUtil._

  /** Try to parse `sqlText` as an MV DDL statement; None ⇒ not ours. */
  def parse(sqlText: String, delegate: ParserInterface): Option[LogicalPlan] =
    sqlText.replaceAll("[;\\s]+$", "") match {
      case CreateStmt(ident, select) =>
        idParts(ident, delegate).map(CreateMaterializedViewCommand(_, select))
      case RefreshStmt(ident) =>
        idParts(ident, delegate).map(p => delegate.parsePlan(
          s"CALL ${quoted(p.init)}.system.refresh_materialized_view" +
            s"('${lit(p.last)}')"))
      case DropStmt(ident) =>
        idParts(ident, delegate).map(p => delegate.parsePlan(
          s"CALL ${quoted(p.init)}.system.drop_materialized_view" +
            s"('${lit(p.last)}')"))
      case _ => None
    }
}

/** Shared by the two DDL surfaces: identifier quoting, the two-part
  * identifier gate, and string-literal escaping for re-embedded text
  * (the default parser's backslash discipline). */
private[plans] object DdlUtil {
  def quoted(parts: Seq[String]): String =
    parts.map(p => s"`${p.replace("`", "``")}`").mkString(".")

  def lit(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** `<catalog>.<name>` (exactly two parts — the governed machinery
    * lives in a named graft catalog); bad identifiers fall through to
    * the delegate's own error surface. */
  def idParts(ident: String,
      delegate: ParserInterface): Option[Seq[String]] =
    try {
      val parts = delegate.parseMultipartIdentifier(ident.trim)
      if (parts.length == 2) Some(parts) else None
    } catch { case _: ParseException => None }
}

/** MAINTENANCE SQL verbs (round 16 — the Delta-lake surface over the
  * existing procedures, same parser seam):
  *
  *   OPTIMIZE <catalog>.<table> [WHERE <cond>]
  *     [ZORDER BY (col [, col]*)] [INTO <n> FILES]
  *   VACUUM <catalog>.<table> [RETAIN <n> VERSIONS] [RETAIN <n> HOURS]
  *
  * Pure parse-time desugar to `CALL <catalog>.system.compact/vacuum` —
  * one implementation, two front doors. OPTIMIZE's commits land the
  * round-16 `#maint` row-preserving marker like any compaction, so the
  * nightly OPTIMIZE never un-accelerates MV dashboards. The WHERE text
  * re-embeds as a string literal with backslash escaping (the default
  * parser's escape discipline); ZORDER BY maps to compact's multi-column
  * sort_by (the Z-order tiling), INTO n FILES to target_files. */
object MaintenanceDdl {
  import DdlUtil._

  private val OptimizeStmt =
    ("""(?is)\s*OPTIMIZE\s+(\S+)""" +
      """(?:\s+WHERE\s+(.+?))?""" +
      """(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?""" +
      """(?:\s+INTO\s+(\d+)\s+FILES)?\s*""").r
  private val VacuumStmt =
    ("""(?is)\s*VACUUM\s+(\S+)""" +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?""" +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*""").r

  def parse(sqlText: String, delegate: ParserInterface): Option[LogicalPlan] =
    sqlText.replaceAll("[;\\s]+$", "") match {
      case OptimizeStmt(ident, where, zorder, target) =>
        idParts(ident, delegate).map { p =>
          val cols = Option(zorder).map(_.split(",").map(_.trim)
            .filter(_.nonEmpty).mkString(",")).getOrElse("")
          delegate.parsePlan(
            s"CALL ${quoted(p.init)}.system.compact('${lit(p.last)}', " +
              s"${Option(target).getOrElse("1")}, '${lit(cols)}', " +
              s"'${lit(Option(where).getOrElse(""))}')")
        }
      case VacuumStmt(ident, versions, hours) =>
        idParts(ident, delegate).map { p =>
          // a BARE `VACUUM t` must not destroy history (round-16
          // self-review): with no RETAIN clause it keeps 7 days of
          // versions (Delta's default horizon) — the retention args
          // compose as the more generous rule, so retain_versions=1
          // only bites once a version is ALSO older than the window.
          // An explicit RETAIN n VERSIONS opts into count-only expiry.
          val h = (Option(versions), Option(hours)) match {
            case (None, None) => "168"
            case (_, hh) => hh.getOrElse("-1")
          }
          delegate.parsePlan(
            s"CALL ${quoted(p.init)}.system.vacuum('${lit(p.last)}', " +
              s"${Option(versions).getOrElse("1")}, $h)")
        }
      case _ => None
    }
}

/** Executable CREATE MATERIALIZED VIEW: analyzes the SELECT against the
  * live session, decompiles the resolved Aggregate into the definition
  * codec, and delegates to [[ManifestMaterializedView.create]]. */
case class CreateMaterializedViewCommand(parts: Seq[String],
    selectText: String) extends LeafRunnableCommand {

  private def fail(why: String): Nothing =
    throw new IllegalArgumentException(
      s"CREATE MATERIALIZED VIEW: $why (definition shape: " +
        "SELECT keys, count/sum/avg/min/max aggregates FROM fact " +
        "[[LEFT] JOIN dim ON cond]* [WHERE filter] GROUP BY keys)")

  override def run(spark: SparkSession): Seq[Row] = {
    val Seq(catalog, mvName) = parts
    val analyzed = spark.sql(selectText).queryExecution.analyzed
    val agg = analyzed match {
      case a: Aggregate => a
      case other => fail("the definition must be a plain GROUP BY " +
        s"aggregate (no ORDER BY / LIMIT / set ops), got ${other.nodeName}")
    }

    // ---- the FROM shape: left-deep joins over manifest relations ----
    final case class Leaf(name: String, cat: String)
    def leafOf(p: LogicalPlan): Option[Leaf] = p match {
      case SubqueryAlias(_, c) => leafOf(c)
      case r: DataSourceV2Relation => (r.catalog, r.identifier) match {
        case (Some(c: GraftManifestCatalog), Some(id))
            if id.namespace.isEmpty =>
          val props = r.table.properties()
          if (props.containsKey("branch") || props.containsKey("versionAsOf"))
            fail(s"'${id.name}' is read at a branch/version — an MV " +
              "definition pins its own versions at create")
          Some(Leaf(id.name, c.name()))
        case _ => None
      }
      case _ => None
    }
    // (filters, dims innermost-first, fact)
    def walk(p: LogicalPlan):
        (Seq[Expression], Seq[(Leaf, Expression, Boolean)], Leaf) =
      p match {
        case SubqueryAlias(_, c) => walk(c)
        case Filter(cond, c) =>
          val (fs, ds, f) = walk(c); (fs :+ cond, ds, f)
        case Join(l, r, jt, Some(cond), _)
            if jt == Inner || jt == LeftOuter =>
          val dim = leafOf(r).getOrElse(fail(
            "each JOIN's right side must be a bare governed table " +
              "(left-deep FROM chain; no subqueries)"))
          val (fs, ds, f) = walk(l)
          (fs, ds :+ ((dim, cond, jt == LeftOuter)), f)
        case Join(_, _, jt, _, _) =>
          fail(s"unsupported join ($jt / missing ON) in the definition")
        case other => leafOf(other) match {
          case Some(leaf) => (Seq.empty, Seq.empty, leaf)
          case None => fail(s"unsupported operator ${other.nodeName} in " +
            "the definition (the FROM must be governed tables of the " +
            "target catalog)")
        }
      }
    val (filters, dims, fact) = walk(agg.child)
    (fact +: dims.map(_._1)).foreach { leaf =>
      if (leaf.cat != catalog)
        fail(s"'${leaf.name}' lives in catalog '${leaf.cat}', not the " +
          s"target catalog '$catalog'")
    }

    // ---- decompile expressions to the codec's bare-name SQL ----
    def bareSql(e: Expression): String = e.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql
    val groupBy = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case other => fail(s"group key '${other.sql}' is not a bare " +
        "column (the incremental fold stores per-key groups)")
    }
    val aggs = agg.aggregateExpressions.flatMap {
      case al @ Alias(ae: AggregateExpression, _) =>
        if (ae.isDistinct) fail(s"DISTINCT aggregate '${al.sql}' cannot " +
          "maintain incrementally (distinct counts don't fold)")
        if (ae.filter.nonEmpty) fail(s"FILTER clause on '${al.sql}' is " +
          "unsupported — move it into WHERE")
        val (func, ex) = ae.aggregateFunction match {
          case Count(Seq(Literal(1, IntegerType))) => ("count_star", "*")
          case Count(Seq(e)) => ("count", bareSql(e))
          case s: Sum => ("sum", bareSql(s.child))
          case a: Average => ("avg", bareSql(a.child))
          case m: Min => ("min", bareSql(m.child))
          case m: Max => ("max", bareSql(m.child))
          case other => fail(s"aggregate '${other.prettyName}' is outside " +
            "the incremental algebra (count/sum/avg/min/max)")
        }
        Some(ManifestMaterializedView.AggSpec(func, ex, al.name))
      case a: AttributeReference if groupBy.contains(a.name) =>
        None // a group key in the select list — always stored anyway
      case al @ Alias(a: AttributeReference, _)
          if groupBy.contains(a.name) =>
        // the MV stores keys under their COLUMN names; silently dropping
        // a rename would make the created view's schema diverge from
        // the declared one (round-16 self-review)
        if (al.name != a.name)
          fail(s"group key '${a.name}' is aliased to '${al.name}' — " +
            "the MV stores keys under their column names; drop the alias")
        None
      case other => fail(s"output '${other.sql}' is neither a group key " +
        "nor a supported aggregate")
    }
    if (aggs.isEmpty) fail("the definition needs at least one aggregate")

    val filterSql = filters.map(bareSql).reduceOption((a, b) => s"($a) AND ($b)")
    ManifestMaterializedView.create(spark, catalog, mvName, fact.name,
      filterSql, groupBy, aggs,
      dims.map { case (t, cond, left) => (t.name, bareSql(cond), left) })
    Seq.empty
  }
}
