package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Luhn mod-10 checksum (ISO/IEC 7812) over the DIGITS of a string —
  * non-digit characters are skipped in place, so formatted inputs
  * ("4539-1488-0343-6467") validate without a separate strip pass.
  * Returns the checksum SUM (a long), not just the validity bit:
  * `luhn_sum(s) % 10 == 0` is the validity test, and the raw sum is
  * what an audit aggregate wants to pin (p15_luhn hashes per-group
  * sums, which a single flipped digit anywhere disturbs).
  *
  * Native Catalyst `UnaryExpression` with codegen (one virtual call
  * per row inside whole-stage codegen — the NormalizeText discipline);
  * the equivalent transform/aggregate HOF pipeline runs interpreted
  * and re-evaluates the substring per lambda, which is the difference
  * between a scan-local byte loop and per-row allocation at 100 TB.
  * Null in, null out. Empty/digit-less input sums to 0 (vacuously
  * "valid" — callers gate on length if they need presence).
  */
object Luhn {
  /** Static worker shared by interpreted eval and generated code:
    * one right-to-left pass over the raw bytes (digits are ASCII, so
    * byte scanning is correct even in UTF-8 text). */
  def luhnSum(input: UTF8String): Long = {
    val bytes = input.getBytes
    var sum = 0L
    var parity = 0 // 0 = odd position from the right (undoubled)
    var i = bytes.length - 1
    while (i >= 0) {
      val b = bytes(i)
      if (b >= '0' && b <= '9') {
        val d = b - '0'
        val v = if (parity == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
        sum += v
        parity ^= 1
      }
      i -= 1
    }
    sum
  }
}

case class LuhnSumExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"luhn_sum requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "luhn_sum"

  override def nullSafeEval(input: Any): Any =
    Luhn.luhnSum(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Luhn.luhnSum($c)")

  override protected def withNewChildInternal(newChild: Expression): LuhnSumExpr =
    copy(child = newChild)
}
