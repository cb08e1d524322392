package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization — the canonical
  * first step of text cleaning for training corpora (decomposed accents,
  * compatibility variants of the same glyph sequence, etc. must hash and
  * dedupe identically). Spark has no built-in normalizer; a Scala UDF
  * would box every row and fall out of whole-stage codegen, so this is
  * the custom-Expression slot from the design brief (same standard as
  * [[CosineSimilarity]]).
  *
  * Two fast paths keep the per-row cost near zero on real corpora:
  *  - pure-ASCII strings (byte count == char count on UTF-8) are returned
  *    untouched without ever materializing a java.lang.String — NFC is the
  *    identity on ASCII;
  *  - non-ASCII strings already in NFC (the overwhelmingly common case for
  *    crawled UTF-8) pass `Normalizer.isNormalized`, a scan without
  *    allocation, and also return the original UTF8String.
  * Only strings that actually change pay for normalize + re-encode.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static kernel shared by eval and codegen (the generated Java calls
    * the static forwarder on the companion class). */
  def nfc(s: UTF8String): UTF8String = {
    // UTF-8 is ASCII iff every char is one byte; NFC never alters ASCII
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column wrapper (classic backend). */
  def apply(c: Column): Column =
    ColumnShim.column(NfcNormalize(ColumnShim.expression(c)))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
    (children: Seq[Expression]) => {
      // descriptive arity error: children.head on zero args would throw a
      // bare NoSuchElementException, and extra args would be SILENTLY
      // dropped (worse) — ADVICE r5
      if (children.length != 1) throw new IllegalArgumentException(
        s"graft_nfc expects exactly 1 argument, got ${children.length}")
      NfcNormalize(children.head)
    })
}
