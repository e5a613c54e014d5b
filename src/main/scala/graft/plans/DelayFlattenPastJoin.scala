package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** PushDownForEachFlatten analog
  * [R: src/org/apache/pig/newplan/logical/rules/PushDownForEachFlatten.java]
  * — the one reference logical rewrite with no Catalyst counterpart
  * (SURVEY §4.1): Spark will not reorder a user `explode` past a join.
  *
  * When a FLATTEN (a `Generate`) sits directly under a join and the
  * join condition references none of the generated columns, evaluate
  * the join FIRST and flatten AFTER:
  *
  * {{{
  *   Join(Generate(g, child), right)  ==>  Generate(g, Join(child, right))
  * }}}
  *
  * Each child row that explodes into k rows would otherwise enter the
  * join k times — at 100 TB that is k× the shuffle write, k× the hash
  * probes, for identical output (the join multiplies each of the k
  * copies by the same m matches either way: k·m = m·k). Delaying the
  * flatten ships the un-exploded row through the shuffle once.
  *
  * Soundness conditions (all checked):
  *  - the generator and join condition are deterministic;
  *  - the condition references no generator-output attribute;
  *  - the preserved/streamed sides line up: for a LEFT-side Generate
  *    the rewrite fires on Inner/Cross/LeftOuter/LeftSemi/LeftAnti
  *    (the generate side is preserved, so null-padding and
  *    empty-array row drops commute with the join); for a RIGHT-side
  *    Generate on Inner/Cross/RightOuter. It does NOT fire when the
  *    generate side is the null-padded side (e.g. right-outer with a
  *    left Generate): a non-outer explode of the null-padded array
  *    would drop rows the original plan kept.
  *
  * The rewritten Generate keeps `unrequiredChildIndex = Nil` (the
  * child grew — ColumnPruning re-derives pruning on the new shape) and
  * a Project restores the original output order/set.
  */
object DelayFlattenPastJoin extends Rule[LogicalPlan] {

  private def hoistable(g: Generate, cond: Option[Expression]): Boolean =
    g.generator.deterministic &&
      cond.forall(_.deterministic) &&
      cond.forall(c => c.references.intersect(AttributeSet(g.generatorOutput)).isEmpty)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // FLATTEN on the build-up (left) side
    case j @ Join(g: Generate, right, joinType, cond, hint)
        if hoistable(g, cond) &&
          (joinType match {
            case Inner | Cross | LeftOuter | LeftSemi | LeftAnti => true
            case _ => false
          }) =>
      val newJoin = Join(g.child, right, joinType, cond, hint)
      val newGen = Generate(g.generator, Nil, g.outer, g.qualifier,
        g.generatorOutput, newJoin)
      Project(j.output, newGen)

    // FLATTEN on the right side
    case j @ Join(left, g: Generate, joinType, cond, hint)
        if hoistable(g, cond) &&
          (joinType match {
            case Inner | Cross | RightOuter => true
            case _ => false
          }) =>
      val newJoin = Join(left, g.child, joinType, cond, hint)
      val newGen = Generate(g.generator, Nil, g.outer, g.qualifier,
        g.generatorOutput, newJoin)
      Project(j.output, newGen)
  }
}
