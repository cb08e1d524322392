package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Descending, Expression, JoinedRow, SortOrder, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.{ColumnShim, PlanShim}
import org.apache.spark.sql.types.LongType

/** Whole-operator extension slot (the design brief's option (c)): a global
  * running sum over a total order as ONE custom physical operator —
  * logical node → [[RunningSumStrategy]] → [[RunningSumExec]], registered
  * through `SparkSessionExtensions.injectPlannerStrategy` in
  * [[graft.GraftExtensions]].
  *
  * Semantics: append `__cum` = running sum of `sumExpr` (nulls add 0)
  * over the total order `sortOrder` — the same contract as
  * [[graft.operators.ScaleOps]]'s DataFrame-level prefix-sum kernel, but
  * where the kernel choreographs repartitionByRange + persist +
  * per-partition totals + broadcast offsets as five DataFrame steps,
  * the exec declares `requiredChildDistribution =
  * OrderedDistribution(sortOrder)` and Catalyst plans the range exchange
  * + sort for it; `doExecute` then runs the two passes directly on the
  * shuffled partitions:
  *
  *  1. a partition-totals job (≤ numPartitions longs to the driver —
  *     metadata, the `RDD.zipWithIndex` pattern; shuffle files are
  *     reused, the child is not recomputed);
  *  2. a streaming output pass adding each partition's prefix offset.
  *
  * No partition ever holds more than its slice; there is no
  * SinglePartition exchange and no window (plan-asserted in
  * ExtensionRuleSpec). Like every running-sum form in this repo the
  * result is partition-boundary-invariant because the order is total —
  * callers must include a tiebreaker column.
  */
case class RunningSumPlan(sortOrder: Seq[SortOrder], sumExpr: Expression,
                          cumAttr: AttributeReference,
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ cumAttr
  override def producedAttributes: AttributeSet = AttributeSet(cumAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): RunningSumPlan =
    copy(child = newChild)
}

object RunningSumStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: RunningSumPlan =>
      RunningSumExec(p.sortOrder, p.sumExpr, p.cumAttr,
        planLater(p.child)) :: Nil
    case _ => Nil
  }
}

case class RunningSumExec(sortOrder: Seq[SortOrder], sumExpr: Expression,
                          cumAttr: AttributeReference,
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ cumAttr
  override def producedAttributes: AttributeSet = AttributeSet(cumAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(OrderedDistribution(sortOrder))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(sortOrder)
  override def outputOrdering: Seq[SortOrder] = sortOrder
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val bound = BindReferences.bindReference(sumExpr, child.output)
    val childRDD = child.execute()
    // pass 1: per-partition totals — one job, N longs to the driver; the
    // range exchange's shuffle files are reused by pass 2 (stage reuse),
    // so the child computes once
    val totals = childRDD.mapPartitions { it =>
      var s = 0L
      it.foreach { row =>
        val v = bound.eval(row)
        if (v != null) s += v.asInstanceOf[Long]
      }
      Iterator.single(s)
    }.collect()
    val offsets = totals.scanLeft(0L)(_ + _)
    val outputAttrs = output
    childRDD.mapPartitionsWithIndex { (idx, it) =>
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val joined = new JoinedRow
      val cumRow = new SpecificInternalRow(Seq(LongType))
      var acc = offsets(idx)
      it.map { row =>
        val v = bound.eval(row)
        if (v != null) acc += v.asInstanceOf[Long]
        cumRow.setLong(0, acc)
        proj(joined(row, cumRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): RunningSumExec =
    copy(child = newChild)
}

/** Public API for the native operator: append `name` = running sum of
  * LONG column `sumCol` over the total order `sortSpecs`
  * ((columnName, ascending) pairs). Columns resolve by name against the
  * analyzed child — classic Columns carry lazily-resolved wrapper nodes
  * that only standard operators convert, so a custom logical node must
  * bind real attributes itself.
  */
object NativeRunningSum {
  def attach(df: DataFrame, sortSpecs: Seq[(String, Boolean)],
             sumCol: String, name: String = "__cum"): DataFrame = {
    val child = PlanShim.logical(df)
    def attrOf(n: String): Attribute =
      child.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"NativeRunningSum: no column '$n' in ${child.output.map(_.name)}"))
    val sumAttr = attrOf(sumCol)
    require(sumAttr.dataType == LongType,
      s"NativeRunningSum: '$sumCol' must be LONG (got ${sumAttr.dataType})")
    val sortOrder = sortSpecs.map { case (n, asc) =>
      SortOrder(attrOf(n), if (asc) Ascending else Descending)
    }
    val cumAttr = AttributeReference(name, LongType, nullable = false)()
    PlanShim.ofRows(df.sparkSession,
      RunningSumPlan(sortOrder, sumAttr, cumAttr, child))
  }
}
