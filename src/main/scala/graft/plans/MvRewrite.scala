package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._

import graft.sources.{GraftManifestCatalog, ManifestFiles, ManifestMaterializedView}

/** TRANSPARENT MATERIALIZED-VIEW REWRITING (round 14): a resolved
  * aggregate over a governed source table silently answers from a
  * matching, EXACTLY-CONSISTENT materialized view — the classic OLAP
  * acceleration (Oracle query rewrite / Calcite materialized views;
  * nothing of the kind exists in the 2.1 reference). Wired through
  * `SparkSessionExtensions.injectPostHocResolutionRule` so it sees
  * fully-resolved plans; `SET spark.graft.mv.rewrite=false` disables.
  *
  * SOUNDNESS RULES (each individually conservative):
  *   - The scan's version must EQUAL the MV checkpoint's sourceVersion —
  *     a current-head read rewrites only while the MV is exactly fresh,
  *     and a `VERSION AS OF <checkpoint>` read rewrites even after the
  *     source moved on (the MV answers exactly that snapshot). Branch
  *     reads never rewrite. The check costs one metadata read
  *     (segment-cached). Same plan-time isolation as any two-table read.
  *   - The replacement reads the MV AS OF checkpoint.mvVersion, so a
  *     crashed refresh's orphan data commits (ahead of the checkpoint)
  *     can never leak into answers.
  *   - Group-bys must be plain columns matching the MV keys as a set;
  *     every output must be a group key or a bare count/sum/avg/min/max
  *     whose argument semantically equals a declared MV aggregate
  *     (resolved against the SAME relation, so casts and exprIds align);
  *     `count(*)` matches any MV on the source (the liveness counter
  *     serves it). Filters must match the MV's filter semantically; a
  *     query filter over GROUP KEYS ONLY on a filterless MV is applied
  *     to the MV read instead (group-level pruning is always legal).
  *   - VALUE-DRIFT GATE: count/min/max/integral-sum rewrite freely
  *     (bit-identical by construction). Fractional sums and every avg
  *     answer from the MV's decimal-exact accumulation, which can
  *     differ from native float summation in the last bits — those
  *     rewrite only under `spark.graft.mv.rewrite.allowNumericDrift`
  *     (the MV's answer is the MORE exact one, but plans must not
  *     change answers by default).
  *
  * The rule never fires on the MV machinery's own reads: create /
  * refresh / recompute all read the source BY PATH (no catalog on the
  * relation), and their fold expressions are signed sums a user query
  * never produces. Output attribute ids and types are preserved
  * exactly, so parent operators are untouched. */
case class MvRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.mv.rewrite", "true").toBoolean
  private def allowDrift: Boolean =
    spark.conf.get("spark.graft.mv.rewrite.allowNumericDrift", "false")
      .toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.resolveOperatorsUp {
      case agg: Aggregate if agg.resolved =>
        try rewrite(agg).getOrElse(agg)
        catch { case _: Exception => agg } // never break a valid plan
    }

  /** Strip aliases; collect at most one conjunction of filters above a
    * catalog-bound manifest relation. */
  private def unwrap(p: LogicalPlan):
      Option[(Option[Expression], DataSourceV2Relation,
          GraftManifestCatalog, Identifier)] = p match {
    case SubqueryAlias(_, c) => unwrap(c)
    case Filter(cond, c) => unwrap(c).map {
      case (None, r, cat, id) => (Some(cond), r, cat, id)
      case (Some(c2), r, cat, id) => (Some(And(cond, c2)), r, cat, id)
    }
    case r: DataSourceV2Relation =>
      (r.catalog, r.identifier) match {
        case (Some(cat: GraftManifestCatalog), Some(id))
            if id.namespace.isEmpty => Some((None, r, cat, id))
        case _ => None
      }
    case _ => None
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (queryFilter, relation, cat, ident) = unwrap(agg.child) match {
      case Some(x) => x
      case None => return None
    }
    // group-bys must be bare columns of the relation
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    val root = spark.conf.get(s"spark.sql.catalog.${cat.name()}.root")
    val srcDir = new Path(root, ident.name)
    val fs = srcDir.getFileSystem(spark.sessionState.newHadoopConf())
    // the version this scan answers: an explicit pin, or the current
    // head; branch reads never rewrite
    val props = relation.table.properties()
    if (props.containsKey("branch")) return None
    val scanVersion = Option(props.get("versionAsOf")).flatMap(_.toIntOption)
      .getOrElse(ManifestFiles.latestComplete(fs, srcDir))

    // candidate MVs: sibling dirs carrying an _MV chain over this source
    val candidates = fs.listStatus(new Path(root)).toSeq
      .filter(_.isDirectory).map(_.getPath)
      .filter(p => ManifestMaterializedView.isMaterializedView(fs, p))
      .flatMap { p =>
        val d = ManifestMaterializedView.readDef(fs, p)
        if (d.source == ident.name && d.sourceVersion == scanVersion)
          Some((p.getName, d))
        else None
      }
    candidates.view.flatMap { case (mvName, d) =>
      // a per-candidate failure (storage drift, unreadable MV) skips
      // that candidate, never the query
      try tryOne(agg, queryFilter, relation, cat, mvName, d)
      catch { case _: Exception => None }
    }.headOption
  }

  /** Resolve an MV definition expression against the query's own
    * relation (same attribute ids), so semanticEquals is meaningful. */
  private def resolveAgainst(relation: DataSourceV2Relation,
      sql: String): Option[Expression] =
    try {
      val df = org.apache.spark.sql.graft.ColumnBridge.ofRows(spark, relation)
      df.select(org.apache.spark.sql.functions.expr(sql))
        .queryExecution.analyzed match {
        case Project(Seq(Alias(e, _)), _) => Some(e)
        case Project(Seq(e), _) => Some(e)
        case _ => None
      }
    } catch { case _: Exception => None }

  private def tryOne(agg: Aggregate, queryFilter: Option[Expression],
      relation: DataSourceV2Relation, cat: GraftManifestCatalog,
      mvName: String, d: ManifestMaterializedView.MvDef):
      Option[LogicalPlan] = {
    val groupNames = agg.groupingExpressions
      .map(_.asInstanceOf[AttributeReference].name)
    if (groupNames.toSet != d.groupBy.toSet) return None

    // ---- filters ----
    val mvFilter = d.filterSql.map(f =>
      resolveAgainst(relation, f).getOrElse(return None))
    val extraKeyFilter: Option[Expression] = (queryFilter, mvFilter) match {
      case (None, None) => None
      case (Some(q), Some(m)) => if (q.semanticEquals(m)) None else return None
      case (Some(q), None) =>
        // group-level pruning: legal iff the filter sees only group keys
        val onKeys = q.references.forall(a => d.groupBy.contains(a.name))
        if (onKeys) Some(q) else return None
      case (None, Some(_)) => return None
    }

    // ---- map every output to an MV storage derivation ----
    val specByFunc: Map[String, Seq[ManifestMaterializedView.AggSpec]] =
      d.aggs.groupBy(_.func)
    def findSpec(funcs: Seq[String], e: Expression):
        Option[ManifestMaterializedView.AggSpec] =
      funcs.flatMap(f => specByFunc.getOrElse(f, Seq.empty)).find(a =>
        resolveAgainst(relation, a.expr).exists(_.semanticEquals(e)))

    // name of the MV storage column(s) + the derivation over them,
    // deferred until the MV plan's attributes exist
    sealed trait Deriv
    case class KeyCol(name: String) extends Deriv
    case class CntStar() extends Deriv
    case class NnCol(a: ManifestMaterializedView.AggSpec) extends Deriv
    case class SumD(a: ManifestMaterializedView.AggSpec, out: DataType)
      extends Deriv
    case class AvgD(a: ManifestMaterializedView.AggSpec) extends Deriv
    case class ExtD(a: ManifestMaterializedView.AggSpec) extends Deriv

    val derivs: Seq[(NamedExpression, Deriv)] = agg.aggregateExpressions.map {
      case ar: AttributeReference if groupNames.contains(ar.name) =>
        (ar, KeyCol(ar.name))
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        val dv: Deriv = ae.aggregateFunction match {
          case Count(Seq(Literal(1, IntegerType))) => CntStar()
          case Count(Seq(e)) =>
            NnCol(findSpec(Seq("count"), e).getOrElse(return None))
          case s: Sum =>
            val a = findSpec(Seq("sum", "avg"), s.child).getOrElse(return None)
            val integral = s.child.dataType match {
              case ByteType | ShortType | IntegerType | LongType => true
              case _ => false
            }
            if (!integral && !allowDrift)
              return None // float-sum order drift: opt-in only
            SumD(a, s.dataType)
          case av: Average =>
            if (!allowDrift) return None
            AvgD(findSpec(Seq("sum", "avg"), av.child).getOrElse(return None))
          case m: Min =>
            ExtD(findSpec(Seq("min"), m.child).getOrElse(return None))
          case m: Max =>
            ExtD(findSpec(Seq("max"), m.child).getOrElse(return None))
          case _ => return None
        }
        (al, dv)
      case al @ Alias(ar: AttributeReference, _)
          if groupNames.contains(ar.name) => (al, KeyCol(ar.name))
      case _ => return None
    }

    // ---- the replacement: MV AS OF checkpoint.mvVersion ----
    val mvIdent = Identifier.of(Array.empty, mvName)
    val mvTable = cat.loadTable(mvIdent, d.mvVersion.toString)
    val mvRel = DataSourceV2Relation.create(mvTable, Some(cat), Some(mvIdent))
    def attr(n: String): AttributeReference =
      mvRel.output.find(_.name == n).map(_.asInstanceOf[AttributeReference])
        .getOrElse(throw new NoSuchElementException(
          s"MV $mvName lacks storage column $n")) // skips this candidate
    def cnt = attr(ManifestMaterializedView.CntCol)
    def nn(a: ManifestMaterializedView.AggSpec) =
      attr(s"__mv_nn_${a.alias}")
    def sumc(a: ManifestMaterializedView.AggSpec) =
      attr(s"__mv_sum_${a.alias}")
    def guard(a: ManifestMaterializedView.AggSpec, v: Expression) =
      If(GreaterThan(nn(a), Literal(0L)), v, Literal(null, v.dataType))

    val projList: Seq[NamedExpression] = derivs.map { case (orig, dv) =>
      val e: Expression = dv match {
        case KeyCol(n) => attr(n)
        case CntStar() => cnt
        case NnCol(a) => nn(a)
        case SumD(a, out) => guard(a, Cast(sumc(a), out))
        case AvgD(a) => guard(a,
          Divide(Cast(sumc(a), DoubleType), Cast(nn(a), DoubleType)))
        case ExtD(a) => attr(s"__mv_ext_${a.alias}")
      }
      if (e.dataType != orig.dataType) return None // exact types only
      Alias(e, orig.name)(exprId = orig.exprId)
    }
    val base = extraKeyFilter match {
      case None => mvRel
      case Some(c) =>
        val remapped = c.transform {
          case a: AttributeReference => attr(a.name)
        }
        Filter(remapped, mvRel)
    }
    logInfo(s"graft MV rewrite: aggregate over " +
      s"${cat.name()}.${d.source} v${d.sourceVersion} answered by " +
      s"materialized view $mvName (as of mv v${d.mvVersion})")
    Some(Project(projList, base))
  }
}
