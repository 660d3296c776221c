package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference engine's signature scalar function: NFKD-decompose,
  * drop non-ASCII code points (accent stripping), lowercase, and map
  * spaces to underscores. Semantics pinned to the reference behavior
  * (/root/reference/scrapper.py:20-26): Python
  * `unicodedata.normalize('NFKD', s).encode('ASCII','ignore').lower().replace(' ', '_')`,
  * null passes through.
  *
  * Implemented as a native Catalyst `UnaryExpression` with codegen (not
  * a Scala UDF) so it participates in whole-stage codegen, constant
  * folding, and null propagation — on a 100 TB scan the difference is a
  * virtual call per row vs a serialized closure per row.
  */
object NormalizeText {
  /** Static worker shared by interpreted eval and generated code. */
  def normalize(input: UTF8String): UTF8String = {
    if (input == null) return null
    val s = input.toString
    val decomposed = Normalizer.normalize(s, Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val ch = decomposed.charAt(i)
      if (ch < 128) {
        if (ch == ' ') sb.append('_')
        else sb.append(Character.toLowerCase(ch))
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class NormalizeTextExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}
