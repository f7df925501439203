package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Descending, EqualTo, Expression, Literal, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition, UnspecifiedFrame}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{Distinct, Filter, InsertIntoStatement, LogicalPlan, Project, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, StructType}

/** A SQL statement the engine adds through the `injectParser` seam
  * (SparkSessionExtensions — reference counterpart: the fork extends
  * `SqlBase.g4`/`SparkSqlParser` in-tree, `sql/catalyst/.../parser/`):
  *
  *   DEDUP TABLE <relation> BY (col [, col]*)
  *     [KEEP {MIN|MAX} <col>] [INTO <table>]
  *
  * - without KEEP: the distinct set of the BY columns (SELECT DISTINCT).
  * - with KEEP MIN o / KEEP MAX o: one FULL row per BY-key — the row
  *   minimizing/maximizing `o` (deterministic whenever (BY, o) is
  *   unique, e.g. a line number or ingest timestamp; the canonical
  *   "keep the first/latest version of each document" dedup).
  * - with INTO t2: write-back form — the deduped rows APPEND into `t2`
  *   (desugars to Spark's own InsertIntoStatement, so the target
  *   resolves through any catalog, including the governed
  *   graft-manifest tables, and lands as one atomic snapshot commit).
  *
  * The parser only claims statements whose first token is DEDUP and that
  * parse completely (a trailing `;` is stripped first — the one
  * almost-well-formed shape users hit constantly); everything else —
  * including malformed DEDUP text — goes to the delegate, so all of
  * Spark's SQL (and its error messages) are untouched. Known limitation:
  * backtick-quoted identifiers containing `,` or `)` fall through to the
  * delegate (the BY-list split is textual).
  *
  * The statement produces an UNRESOLVED custom node ([[DedupTable]]); the
  * companion analyzer rule ([[ResolveDedupTable]], wired via
  * `injectResolutionRule`) rewrites it into Window(row_number) →
  * Filter(rn=1) → Project once the child resolves — the same
  * desugar-at-analysis pattern Spark itself uses for e.g. `Deduplicate`.
  * Execution is therefore the already-audited window shape: one shuffle
  * on the BY key, streaming rank, no extra pass.
  */
object DedupStatement {
  // Identifier chars are validated by re-parsing each captured piece with
  // the delegate parser, so backtick-quoted or multipart names work and
  // nothing textual is ever re-embedded into SQL.
  private val Stmt =
    ("""(?is)\s*DEDUP\s+TABLE\s+(.+?)\s+BY\s*\(([^)]+)\)""" +
      """\s*(?:KEEP\s+(MIN|MAX)\s+(\S+)\s*)?(?:INTO\s+(\S+)\s*)?""").r

  /** Try to parse `sqlText` as a DEDUP statement; None ⇒ not ours. */
  def parse(sqlText: String, delegate: ParserInterface): Option[LogicalPlan] =
    // strip trailing statement terminators/whitespace (the regex is
    // full-match, so a stray ';' would otherwise bounce a valid DEDUP
    // to the delegate and surface as Spark's generic syntax error)
    sqlText.replaceAll("[;\\s]+$", "") match {
      case Stmt(table, cols, keepKind, keep, into) =>
        try {
          val rel = UnresolvedRelation(
            delegate.parseMultipartIdentifier(table.trim))
          val by = cols.split(',').map(c =>
            UnresolvedAttribute(delegate.parseMultipartIdentifier(c.trim)))
          val deduped = Option(keep) match {
            case None => Distinct(Project(by.toSeq, rel))
            case Some(k) =>
              val keepAttr = UnresolvedAttribute(
                delegate.parseMultipartIdentifier(k.trim))
              DedupTable(rel, by.toSeq, keepAttr,
                max = keepKind.equalsIgnoreCase("MAX"))
          }
          Some(Option(into) match {
            case None => deduped
            case Some(t) => InsertIntoStatement(
              UnresolvedRelation(delegate.parseMultipartIdentifier(t.trim)),
              Map.empty, Nil, deduped,
              overwrite = false, ifPartitionNotExists = false)
          })
        } catch { case _: ParseException => None } // bad idents → delegate
      case _ => None
    }
}

/** Unresolved placeholder for `DEDUP TABLE ... KEEP MIN ...`: carries the
  * parsed pieces until the analyzer has resolved the child relation, at
  * which point [[ResolveDedupTable]] rewrites it away. Never survives to
  * optimization (`resolved` is pinned false — an unresolved leftover
  * fails analysis loudly instead of planning). */
case class DedupTable(child: LogicalPlan, by: Seq[Expression],
    keep: Expression, max: Boolean = false) extends UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): DedupTable =
    copy(child = c)
}

/** Analyzer rule (injectResolutionRule): desugars [[DedupTable]] into the
  * deterministic keep-one-row-per-key window shape. Runs inside the
  * resolution fixpoint, so the Window/Filter it emits are themselves
  * resolved (frames filled in, attributes bound) by Spark's own rules on
  * the following passes. */
object ResolveDedupTable extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case DedupTable(child, by, keep, max) if child.resolved =>
        val direction = if (max) Descending else Ascending
        val order = SortOrder(keep, direction,
          direction.defaultNullOrdering, Seq.empty)
        val rn = Alias(
          WindowExpression(RowNumber(),
            WindowSpecDefinition(by, Seq(order), UnspecifiedFrame)),
          "__graft_dedup_rn")()
        Project(child.output,
          Filter(EqualTo(rn.toAttribute, Literal(1)),
            Window(Seq(rn), by, Seq(order), child, None)))
    }
}

/** Delegating [[ParserInterface]]: DEDUP statements parse here, every
  * other entry point forwards verbatim (including the parameterized-plan
  * path, so named-parameter SQL keeps working through the wrapper). */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    DedupStatement.parse(sqlText, delegate)
      .orElse(MvDdl.parse(sqlText, delegate))
      .orElse(MaintenanceDdl.parse(sqlText, delegate))
      .getOrElse(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    DedupStatement.parse(sqlText, delegate)
      .orElse(MvDdl.parse(sqlText, delegate))
      .orElse(MaintenanceDdl.parse(sqlText, delegate))
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
