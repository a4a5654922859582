package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object TextNormKernels {
  /** Unicode NFC (canonical composition) over a UTF8String. The JDK's
    * `java.text.Normalizer` implements the same Unicode canonical
    * composition tables as utf8proc/ICU, so external engines agree
    * byte-for-byte on the result. ASCII fast path: canonical
    * composition never alters pure-ASCII text, so the (overwhelmingly
    * common) ASCII document skips the String round-trip entirely. */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) {
        return UTF8String.fromString(
          java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }
}

/** `nfc_normalize(string) -> string` as a codegen'd Catalyst
  * `Expression` — the text-normalization pass every training pipeline
  * runs before dedup/fingerprinting (byte-identical text that differs
  * only in combining-character order must hash identically). A Scala
  * UDF here would box every row and break whole-stage codegen; this
  * stays a static Java call inside the generated stage, and the ASCII
  * fast path makes the common case a no-op. No reference counterpart
  * (the reference is an encode library; SURVEY.md §2.6). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize needs string, got $t")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(input: Any): Any =
    TextNormKernels.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNormKernels.nfc($c);")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextNormalize {
  /** `nfc(col)` as a Column. */
  def nfc(col: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      NfcNormalize(org.apache.spark.sql.graftbridge.ColumnBridge.expr(col)))
}
