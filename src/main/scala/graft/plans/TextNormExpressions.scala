package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text-normalization expressions for corpus cleanup — NFC
  * canonicalization and accent folding, the first two steps of any
  * multilingual training-data pipeline (mixed crawls carry the same word in
  * composed and decomposed forms, which defeats exact/fingerprint dedup).
  *
  * Native codegen'd expressions, not UDFs: they stay inside whole-stage
  * codegen, cost one java.text.Normalizer call per row, and carry no
  * serialization penalty. Semantics mirror DuckDB/utf8proc exactly on
  * canonical text (NFC == NFC; accent strip == NFD → drop nonspacing marks →
  * NFC), which is what the q126 oracle pins.
  */
object TextNormExpressions {
  // Cast-to-string at the builder keeps the expression monomorphic (the
  // cast is a no-op on string columns and folds away; NULL literals of
  // NullType become string NULLs instead of an analysis error)
  def nfcNormalize(c: Column): Column =
    GraftBridge.toColumn(NfcNormalize(asString(GraftBridge.toExpression(c))))

  def stripAccents(c: Column): Column =
    GraftBridge.toColumn(StripAccents(asString(GraftBridge.toExpression(c))))

  private[plans] def asString(e: Expression): Expression = Cast(e, StringType)
}

/** Static normalization kernels — referenced by both interpreted eval and
  * generated code (codegen emits calls to these, so the two paths cannot
  * drift). */
object TextNorm {
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  // \p{Mn} = nonspacing combining marks; compiled once per JVM
  private val marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** NFD → drop nonspacing marks → NFC: 'é' → 'e', 'ğ' → 'g'; characters
    * with no canonical decomposition (ø, —, №, ligature ﬁ) pass through —
    * the same contract as DuckDB/utf8proc strip_accents. */
  def stripAccents(s: UTF8String): UTF8String = {
    val nfd = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    val bare = marks.matcher(nfd).replaceAll("")
    UTF8String.fromString(
      java.text.Normalizer.normalize(bare, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode canonical composition (NFC) of a string column. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Accent folding of a string column (NFD → strip \p{Mn} → NFC). */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextNorm.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextNorm.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
