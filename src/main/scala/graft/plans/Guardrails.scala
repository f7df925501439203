package graft.plans

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}

/** Analysis-time guardrails (`SparkSessionExtensions.injectCheckRule`):
  * the runtime twin of the test-side plan audit (PlanAuditSpec) — at
  * 100 TB an accidental cartesian or an unpartitioned window is not a
  * slow query, it is an outage, and the cheapest place to stop it is
  * BEFORE any task launches.
  *
  * Opt-in per session (default off, so ad-hoc exploration is untouched):
  *
  *   SET spark.graft.guard = true
  *
  * rejects, with an actionable message:
  *   - condition-less CROSS joins (`crossJoin()`, `CROSS JOIN` SQL) —
  *     the unbounded |L|×|R| shape. Spark's own
  *     `spark.sql.crossJoin.enabled` (2.x) guarded only SOME of these
  *     and is gone in 3+; this guard is explicit and engine-scoped.
  *     (Inner-with-no-condition is NOT matched: `Dataset.join`
  *     internally pre-analyzes exactly that shape to disambiguate
  *     self-joins before attaching the USING condition, so a check rule
  *     rejecting it would break every keyed Dataset join.)
  *   - window functions with an empty PARTITION BY — the whole dataset
  *     flows through ONE task's sort buffer; correct on a dimension
  *     table, catastrophic on a fact table, and indistinguishable at
  *     parse time — so the guard makes the author say which it is
  *     (repartition to a keyed window, or turn the guard off for the
  *     session running the small-table report).
  *
  * A check rule sees the ANALYZED plan and throws to reject — it cannot
  * rewrite (that is the optimizer seam). GuardrailsSpec pins both
  * rejections, the off-by-default behavior, and that keyed shapes pass. */
class GraftGuardrails(session: SparkSession) extends (LogicalPlan => Unit) {

  private def enabled: Boolean =
    session.conf.get("spark.graft.guard", "false").toBoolean

  override def apply(plan: LogicalPlan): Unit = if (enabled) {
    plan.foreach {
      case j @ Join(_, _, Cross, None, _) =>
        throw new AnalysisException(
          errorClass = "USER_RAISED_EXCEPTION",
          messageParameters = Map("errorMessage" ->
            ("graft guard: condition-less cross join - unbounded " +
              "|left|x|right| fan-out. Add a join condition, or SET " +
              "spark.graft.guard=false for this session. Plan: " +
              j.simpleString(3))))
      case w @ Window(_, partitionSpec, _, _, _) if partitionSpec.isEmpty =>
        throw new AnalysisException(
          errorClass = "USER_RAISED_EXCEPTION",
          messageParameters = Map("errorMessage" ->
            ("graft guard: window with empty PARTITION BY - the full " +
              "input sorts through one task. Partition the window, or " +
              "SET spark.graft.guard=false for this session. Plan: " +
              w.simpleString(3))))
      case _ =>
    }
  }
}
