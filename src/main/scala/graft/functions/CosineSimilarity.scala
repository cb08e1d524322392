package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity over `array<float|double>`
  * columns, with `doGenCode` so the hot loop stays inside whole-stage
  * codegen (primitive reads, no boxing).
  *
  * Rationale: Spark's higher-order functions (`zip_with`/`aggregate`) are
  * CodegenFallback — every element evaluation is interpreted with boxed
  * lambdas. For 64-dim embeddings scored millions of times in similarity
  * search (SimilarityOps), the interpreted path dominates runtime. This is
  * the preferred extension slot (custom Expression > UDF) from the design
  * brief; semantics match SimilarityOps.cosine exactly (same accumulation
  * order → bitwise-identical doubles), verified in NativeCosineSpec.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects array<float>/array<double>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // any null element → 0.0, matching the HOF reference implementation
    // (null poisons the aggregate sums, and `when(null > 0, …)` falls
    // through to the otherwise(0.0) branch)
    var k = 0
    while (k < x.numElements()) { if (x.isNullAt(k)) return 0.0; k += 1 }
    k = 0
    while (k < y.numElements()) { if (y.isNullAt(k)) return 0.0; k += 1 }
    val lf = isFloat(left); val rf = isFloat(right)
    @inline def xv(i: Int): Double = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
    @inline def yv(i: Int): Double = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { val a0 = xv(i); val b0 = yv(i); dot += a0 * b0; na += a0 * a0; nb += b0 * b0; i += 1 }
    var j = n
    while (j < x.numElements()) { val a0 = xv(j); na += a0 * a0; j += 1 }
    j = n
    while (j < y.numElements()) { val b0 = yv(j); nb += b0 * b0; j += 1 }
    if (na > 0 && nb > 0) dot / (math.sqrt(na) * math.sqrt(nb)) else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val anyNull = ctx.freshName("anyNull")
      s"""
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $a.numElements() && !$anyNull; $i++) {
         |  if ($a.isNullAt($i)) $anyNull = true;
         |}
         |for (int $i = 0; $i < $b.numElements() && !$anyNull; $i++) {
         |  if ($b.isNullAt($i)) $anyNull = true;
         |}
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |if (!$anyNull) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double av = (double) $a.$lGet($i);
         |    double bv = (double) $b.$rGet($i);
         |    $dot += av * bv; $na += av * av; $nb += bv * bv;
         |  }
         |  for (int $i = $n; $i < $a.numElements(); $i++) {
         |    double av = (double) $a.$lGet($i); $na += av * av;
         |  }
         |  for (int $i = $n; $i < $b.numElements(); $i++) {
         |    double bv = (double) $b.$rGet($i); $nb += bv * bv;
         |  }
         |}
         |${ev.value} = (!$anyNull && $na > 0.0 && $nb > 0.0)
         |  ? $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)) : 0.0;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column wrapper (classic backend). */
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(
      CosineSimilarity(ColumnShim.expression(a), ColumnShim.expression(b)))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      if (children.length != 2) throw new IllegalArgumentException(
        s"graft_cosine expects exactly 2 arguments, got ${children.length}")
      CosineSimilarity(children(0), children(1))
    })
}
