package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}

/** Catalyst optimizer rule (injected via
  * [[graft.GraftExtensions]].injectOptimizerRule): rewrites the NAIVE
  * spellings of a tolerance join,
  *
  * {{{
  * left.join(right, abs(l.k - r.k) <= lit(delta))                  // longs
  * left.join(right, l.k.between(r.k - delta, r.k + delta))         // longs
  * left.join(right, abs(l.ts - r.ts) <= expr("INTERVAL 30 SECOND")) // timestamps
  * }}}
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
  * Scope (widened in r7 per the r6 verdict, still deliberately
  * conservative): INNER joins whose condition is EXACTLY one of
  *  - `abs(a − b) <= literal` over LONG attributes (either comparison
  *    orientation) — the canonical spelling for epoch-micros keys;
  *  - `a >= b − d AND a <= b + d` over LONG attributes with the same
  *    literal `d` in both conjuncts — what `Column.between(b−d, b+d)`
  *    produces;
  *  - `abs(a − b) <= INTERVAL` over TIMESTAMP attributes — normalized to
  *    epoch-micros ([[org.apache.spark.sql.catalyst.expressions.UnixMicros]])
  *    for bucketing; the interval literal's underlying micros value is the
  *    delta (timestamps ARE micros, so |µ(a)−µ(b)| ≤ d ⇔ |a−b| ≤ interval).
  *
  * One key per side, delta > 0. Anything else is left untouched; the
  * explicit RangeJoin/AsOfJoin operators remain the full-featured path
  * (per-key tolerance, direction, outer sides). The rewritten condition's
  * top node is a conjunction whose left leg is a bucket equality, so the
  * rule cannot re-match its own output. Keys are assumed far from ±2⁶³
  * (an overflowing b±d in the NAIVE spelling wraps before this rule ever
  * sees it); the original predicate is always re-checked verbatim, so
  * emitted rows satisfy exactly the user's condition.
  */
object IntervalJoinRule extends Rule[LogicalPlan] {

  /** (leftKeyAsLong, rightKeyAsLong, delta) when the predicate is one of
    * the canonical tolerance shapes with one key attribute per side. The
    * returned key expressions are LongType (timestamp keys wrapped in
    * UnixMicros) and reference exactly one side each.
    */
  private def absTolerance(cond: Expression, l: LogicalPlan,
                           r: LogicalPlan):
      Option[(Expression, Expression, Long)] = {
    // orient (a, b) so the first key is left-side; keys stay raw attrs
    def keys(a: AttributeReference, b: AttributeReference, d: Long,
             wrap: Expression => Expression) = {
      val (lset, rset) = (l.outputSet, r.outputSet)
      if (lset.contains(a) && rset.contains(b)) Some((wrap(a), wrap(b), d))
      else if (lset.contains(b) && rset.contains(a)) Some((wrap(b), wrap(a), d))
      else None
    }
    val id = identity[Expression] _
    val us = (e: Expression) => UnixMicros(e): Expression
    cond match {
      case LessThanOrEqual(Abs(Subtract(a: AttributeReference,
          b: AttributeReference, _), _), Literal(d: Long, LongType)) =>
        keys(a, b, d, id)
      case GreaterThanOrEqual(Literal(d: Long, LongType),
          Abs(Subtract(a: AttributeReference, b: AttributeReference, _), _)) =>
        keys(a, b, d, id)
      // a BETWEEN b - d AND b + d (Column.between / SQL BETWEEN lowering):
      // equivalent to abs(a - b) <= d for longs away from the wrap point
      case And(
          GreaterThanOrEqual(a1: AttributeReference,
            Subtract(b1: AttributeReference, Literal(d1: Long, LongType), _)),
          LessThanOrEqual(a2: AttributeReference,
            Add(b2: AttributeReference, Literal(d2: Long, LongType), _)))
          if a1.semanticEquals(a2) && b1.semanticEquals(b2) && d1 == d2 =>
        keys(a1, b1, d1, id)
      // abs(ts - ts) <= INTERVAL: DayTimeIntervalType literals carry their
      // value as micros (Long) — the exact unit UnixMicros buckets in
      case LessThanOrEqual(Abs(st: SubtractTimestamps, _),
          Literal(d: Long, _: DayTimeIntervalType)) =>
        tsKeys(st, d, keys, us)
      case GreaterThanOrEqual(Literal(d: Long, _: DayTimeIntervalType),
          Abs(st: SubtractTimestamps, _)) =>
        tsKeys(st, d, keys, us)
      case _ => None
    }
  }

  private def tsKeys(st: SubtractTimestamps, d: Long,
                     keys: (AttributeReference, AttributeReference, Long,
                       Expression => Expression) =>
                       Option[(Expression, Expression, Long)],
                     us: Expression => Expression):
      Option[(Expression, Expression, Long)] =
    (st.left, st.right) match {
      case (a: AttributeReference, b: AttributeReference)
          if a.dataType == TimestampType && b.dataType == TimestampType =>
        keys(a, b, d, us)
      case _ => None
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
