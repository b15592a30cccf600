package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernel for Unicode NFC normalization — canonical composition
  * ("e" + U+0301 → "é"), the first step of any text-cleaning pipeline:
  * exact dedup, fingerprints and token counts all change if visually
  * identical strings differ in code-point sequence.
  *
  * Spark has no built-in normalizer, and a Scala UDF would leave
  * whole-stage codegen, so this follows the ParseDollarsKernel pattern:
  * a static-forwarder kernel called from both the interpreted path and
  * generated Java. The NFC quick-check (`isNormalized`) makes the common
  * case — already-normal ASCII/UTF-8 — a single scan with ZERO
  * allocation; only rows that actually need composing pay for it.
  * java.text.Normalizer implements Unicode TR15, the same spec DuckDB's
  * utf8proc `nfc_normalize` implements, so oracle compares are exact. */
object NormalizeNfcKernel {
  def normalize(input: UTF8String): UTF8String = {
    if (input == null) return null
    val s = input.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}

/** Native Catalyst expression around NormalizeNfcKernel (codegen'd,
  * null-safe, stays inside WholeStageCodegen spans). */
case class NormalizeNfcExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"

  override def nullSafeEval(input: Any): Any =
    NormalizeNfcKernel.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeNfcKernel.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfcExpr =
    copy(child = newChild)
}

object NormalizeNfc {
  /** Column API: NFC normalization as a native expression. */
  def normalize_nfc(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NormalizeNfcExpr(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
