package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expression: SQUARED Euclidean distance over
  * `array<float|double>` columns — the metric of product-quantization
  * codebooks ([[graft.operators.SimilarityOps]] PQ family), where cosine
  * (the IVF/[[CosineSimilarity]] metric) is not the convention. Squared —
  * not rooted — on purpose: argmin is unchanged, one libm call less, and
  * sums of squares stay exactly reproducible in oracle SQL.
  *
  * Same design rationale as [[CosineSimilarity]]: higher-order-function
  * spellings (`zip_with`/`aggregate`) are CodegenFallback and box every
  * element; this stays inside whole-stage codegen with primitive reads.
  * Accumulation is sequential in index order, so any engine summing the
  * same doubles left-to-right (DuckDB `list_sum` over `list_transform`)
  * reproduces it bit-for-bit. Length mismatch: excess elements of the
  * longer array count as distance from zero (consistent with the
  * [[CosineSimilarity]] tail convention). A null ELEMENT yields
  * Double.MaxValue — "maximally far", so a corrupt vector can never win
  * an argmin — mirroring CosineSimilarity's corrupt→worst-score (0.0)
  * convention under its metric's direction.
  */
case class L2DistanceSq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq expects array<float>/array<double>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var k = 0
    while (k < x.numElements()) { if (x.isNullAt(k)) return Double.MaxValue; k += 1 }
    k = 0
    while (k < y.numElements()) { if (y.isNullAt(k)) return Double.MaxValue; k += 1 }
    val lf = isFloat(left); val rf = isFloat(right)
    @inline def xv(i: Int): Double = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
    @inline def yv(i: Int): Double = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = xv(i) - yv(i); s += d * d; i += 1 }
    var j = n
    while (j < x.numElements()) { val d = xv(j); s += d * d; j += 1 }
    j = n
    while (j < y.numElements()) { val d = yv(j); s += d * d; j += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val anyNull = ctx.freshName("anyNull")
      val d = ctx.freshName("d")
      s"""
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $a.numElements() && !$anyNull; $i++) {
         |  if ($a.isNullAt($i)) $anyNull = true;
         |}
         |for (int $i = 0; $i < $b.numElements() && !$anyNull; $i++) {
         |  if ($b.isNullAt($i)) $anyNull = true;
         |}
         |double $s = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |if ($anyNull) {
         |  $s = java.lang.Double.MAX_VALUE;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double) $a.$lGet($i) - (double) $b.$rGet($i);
         |    $s += $d * $d;
         |  }
         |  for (int $i = $n; $i < $a.numElements(); $i++) {
         |    double $d = (double) $a.$lGet($i); $s += $d * $d;
         |  }
         |  for (int $i = $n; $i < $b.numElements(); $i++) {
         |    double $d = (double) $b.$rGet($i); $s += $d * $d;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2DistanceSq {
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(
      L2DistanceSq(ColumnShim.expression(a), ColumnShim.expression(b)))
}
