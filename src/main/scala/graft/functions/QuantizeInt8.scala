package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric int8 quantization stats of an embedding in ONE pass —
  * `quantize_i8_stats(vec)` returns `array<long>`
  * `[n_dims, checksum, n_sat]` where, with `scale = max(|x|)/127`:
  *
  *   q_i       = floor(x_i * 127 / max|x| + 0.5)   (all-zero if max|x| = 0)
  *   checksum  = Σ q_i · i  (1-based — position-weighted so element
  *               order errors can't cancel)
  *   n_sat     = |{ i : |q_i| = 127 }|
  *
  * The arithmetic is pinned to double IEEE ops (`floor(x+0.5)`, not a
  * round() whose tie behavior differs between engines), so the DuckDB
  * oracle reproduces it bit-for-bit.
  *
  * Why an expression: quantization is a pure map over the corpus — the
  * archetypal scan-bound 100 TB stage — and the relational HOF form
  * (kept in `VectorQueries.quantStatsHof` as the spec oracle) runs
  * interpreted with per-consumer re-evaluation. One tight loop keeps
  * the stage inside whole-stage codegen. Null element or empty vector
  * ⇒ null (same convention as lsh_buckets). */
object QuantizeInt8 {

  /** Static worker shared by interpreted eval and generated code. */
  def compute(vec: ArrayData, floatElems: Boolean): ArrayData = {
    val n = vec.numElements()
    if (n == 0) return null
    val v = new Array[Double](n)
    var i = 0
    var maxAbs = 0.0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      val x = if (floatElems) vec.getFloat(i).toDouble else vec.getDouble(i)
      v(i) = x
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    var checksum = 0L
    var nSat = 0L
    if (maxAbs > 0d) {
      i = 0
      while (i < n) {
        val q = math.floor(v(i) * 127d / maxAbs + 0.5d).toLong
        checksum += q * (i + 1)
        if (q == 127L || q == -127L) nSat += 1
        i += 1
      }
    }
    new GenericArrayData(Array(n.toLong, checksum, nSat))
  }
}

case class QuantizeInt8Expr(child: Expression) extends UnaryExpression {

  private def floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_i8_stats requires array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_i8_stats"

  // null from non-null input (empty vector / null element)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    QuantizeInt8.compute(input.asInstanceOf[ArrayData], floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.QuantizeInt8.compute($c, $floatElems);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Expr =
    copy(child = newChild)
}
