package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule (injected via
  * [[graft.GraftExtensions]].injectOptimizerRule): rewrites the NAIVE
  * spelling of a tolerance join,
  *
  * {{{ left.join(right, abs(l.k - r.k) <= lit(delta)) }}}
  *
  * which Spark can only plan as a BroadcastNestedLoopJoin / cartesian
  * product (O(|L|·|R|) comparisons — a non-starter at 100 TB), into the
  * bucketed equi-join shape that
  * [[graft.operators.RangeJoin.pairsWithinTolerance]] exposes as an
  * explicit API: bucket ids of width delta on both sides (left exploded
  * to its three adjacent buckets), an EQUI join on the bucket, and the
  * original predicate re-checked exactly. |l−r| ≤ delta implies the
  * delta-wide monotone buckets differ by at most 1, so candidate
  * generation is hash-partitionable and the cross product never forms.
  *
  * Scope (v1, deliberately conservative): INNER joins whose condition is
  * EXACTLY `abs(a − b) <= literal` (either comparison orientation) over
  * LONG attributes, one from each side — the canonical spelling for
  * epoch-micros keys. Anything else is left untouched; the explicit
  * RangeJoin/AsOfJoin operators remain the full-featured path
  * (timestamps, per-key tolerance, direction). The rewritten condition's
  * top node is a conjunction, so the rule cannot re-match its own output.
  */
object IntervalJoinRule extends Rule[LogicalPlan] {

  /** (leftKey, rightKey, delta) when the predicate is the canonical
    * abs-tolerance shape with one key per side.
    */
  private def absTolerance(cond: Expression, l: LogicalPlan,
                           r: LogicalPlan):
      Option[(AttributeReference, AttributeReference, Long)] = {
    def keys(a: AttributeReference, b: AttributeReference, d: Long) = {
      val (lset, rset) = (l.outputSet, r.outputSet)
      if (lset.contains(a) && rset.contains(b)) Some((a, b, d))
      else if (lset.contains(b) && rset.contains(a)) Some((b, a, d))
      else None
    }
    cond match {
      case LessThanOrEqual(Abs(Subtract(a: AttributeReference,
          b: AttributeReference, _), _), Literal(d: Long, LongType)) =>
        keys(a, b, d)
      case GreaterThanOrEqual(Literal(d: Long, LongType),
          Abs(Subtract(a: AttributeReference, b: AttributeReference, _), _)) =>
        keys(a, b, d)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), JoinHint.NONE)
        if absTolerance(cond, left, right).exists(_._3 > 0) =>
      val (lk, rk, delta) = absTolerance(cond, left, right).get
      val d = Literal(delta, LongType)
      // trunc-div buckets: monotone, every cell ≥ delta wide (the cell
      // straddling 0 is wider, which only tightens adjacency) — so
      // |l−r| ≤ delta ⇒ bucket ids differ by ≤ 1
      def bucket(k: Expression) = IntegralDivide(k, d)
      val lb = AttributeReference("__graft_lb", LongType, nullable = true)()
      val exploded = Generate(
        Explode(CreateArray(Seq(
          Subtract(bucket(lk), Literal(1L, LongType)),
          bucket(lk),
          Add(bucket(lk), Literal(1L, LongType))))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(lb), child = left)
      val rbAlias = Alias(bucket(rk), "__graft_rb")()
      val projected = Project(right.output :+ rbAlias, right)
      val bucketed = Join(exploded, projected, Inner,
        Some(And(EqualTo(lb, rbAlias.toAttribute), cond)), JoinHint.NONE)
      Project(j.output, bucketed)
  }
}
