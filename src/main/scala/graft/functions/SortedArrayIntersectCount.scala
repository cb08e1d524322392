package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expression: intersection size of two SORTED
  * `array<bigint>` columns via an O(n+m) merge scan in generated code.
  *
  * Used by the set-similarity verifier (DedupOps.ngramJaccardPairs): the
  * shingle-hash arrays are already hash-sorted for prefix filtering, so the
  * per-candidate intersection needs no hashing at all — two primitive
  * cursors. `array_intersect` by contrast is interpreted and builds a hash
  * set per evaluation. Duplicate values count multiset-style (both sides'
  * inputs are distinct sets upstream).
  */
case class SortedArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_intersect_count expects array<bigint>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    while (i < x.numElements() && j < y.numElements()) {
      // null slots can never match anything — skip them (upstream producers
      // emit non-null hash arrays; this guards ad-hoc SQL callers)
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long xv = $a.getLong($i); long yv = $b.getLong($j);
         |    if (xv == yv) { $c++; $i++; $j++; }
         |    else if (xv < yv) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedArrayIntersectCount {
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(SortedArrayIntersectCount(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sorted_intersect_count"),
    new ExpressionInfo(classOf[SortedArrayIntersectCount].getName,
      "graft_sorted_intersect_count"),
    (children: Seq[Expression]) => {
      if (children.length != 2) throw new IllegalArgumentException(
        s"graft_sorted_intersect_count expects exactly 2 arguments, got ${children.length}")
      SortedArrayIntersectCount(children(0), children(1))
    })
}
