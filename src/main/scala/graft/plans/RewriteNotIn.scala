package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, EqualTo, In, InSet, IsNotNull, Literal, Not}
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, Join, JoinHint, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite `attr NOT IN (<many literals>)` into a
  * left-anti join against a local relation of those literals.
  *
  * This is the plan-level cure for the reference's collect+`isin`
  * upsert (ref: glue/data_aggregate_gold.py:79-83, SURVEY.md O-12):
  * user code that filters against a large collected list gets the
  * join-based plan automatically — a literal `In` list evaluates
  * per row per element, while the anti join hashes the list once
  * (and at scale can broadcast or shuffle it).
  *
  * NULL semantics are preserved exactly:
  *  - `x NOT IN (list)` is NULL (row dropped) when x IS NULL → the
  *    rewritten child filters `IsNotNull(attr)` first;
  *  - a NULL in the list makes NOT IN never-true → such filters are
  *    NOT rewritten (left as-is).
  *
  * Registered via [[graft.ext.GraftExtensions]] or
  * `spark.experimental.extraOptimizations`.
  */
object RewriteNotIn extends Rule[LogicalPlan] {

  /** Below this, the linear literal scan is cheaper than a join. */
  val minListSize = 16

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // `OptimizeIn` turns big literal lists into InSet before external
    // rules run, so match both spellings
    case Filter(Not(In(attr: Attribute, list)), child)
        if list.size >= minListSize &&
          list.forall(e => e.isInstanceOf[Literal] && e.asInstanceOf[Literal].value != null) =>
      antiJoin(attr, list.map(_.asInstanceOf[Literal].value), child)
    case Filter(Not(InSet(attr: Attribute, hset)), child)
        if hset.size >= minListSize && !hset.contains(null) =>
      antiJoin(attr, hset.toSeq, child)
  }

  private def antiJoin(attr: Attribute, values: Seq[Any], child: LogicalPlan): LogicalPlan = {
    val out = AttributeReference("__graft_notin_value", attr.dataType, nullable = false)()
    val rel = LocalRelation(Seq(out), values.map(v => InternalRow(v)))
    Join(
      Filter(IsNotNull(attr), child),
      rel,
      LeftAnti,
      Some(EqualTo(attr, out)),
      JoinHint.NONE)
  }
}
