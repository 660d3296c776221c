package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product over two numeric arrays, accumulated in double in index
  * order — a native Catalyst expression with codegen (SURVEY §4
  * "custom pieces", north-star X2).
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0d, _+_)`: higher-order
  * functions are CodegenFallback — every row pays interpreted lambda
  * dispatch plus an intermediate array allocation. For brute-force
  * similarity search the dot product IS the hot loop (pairs × dims);
  * this expression compiles to a tight primitive loop inside
  * whole-stage codegen: ~100× less overhead, zero allocation.
  *
  * Semantics (drop-in for the HOF formulation on well-formed input):
  * result is null if either array is null, lengths differ, or any
  * element is null — exactly what zip_with+aggregate null-propagation
  * yields. Accumulation order is ascending index on both, so results
  * are bit-identical to the sequential fold.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) match {
      case FloatType | DoubleType | IntegerType | LongType | ShortType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires arrays of numeric elements, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  // Can produce null from non-null inputs (length mismatch, null
  // element) — without this override Spark trusts child nullability,
  // skips the null check in generated code, and a null result silently
  // reads as 0.0.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xa, xb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = xa.numElements()
    if (n != xb.numElements()) return null
    val (ta, tb) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xa.isNullAt(i) || xb.isNullAt(i)) return null
      acc += xa.get(i, ta).asInstanceOf[Number].doubleValue *
        xb.get(i, tb).asInstanceOf[Number].doubleValue
      i += 1
    }
    acc
  }

  private def primAccessor(et: DataType, arr: String, i: String): String = et match {
    case FloatType => s"(double)$arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double)$arr.getInt($i)"
    case LongType => s"(double)$arr.getLong($i)"
    case ShortType => s"(double)$arr.getShort($i)"
    case _ => throw new IllegalStateException(s"unsupported element type $et")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getA = primAccessor(elemType(left), a, i)
      val getB = primAccessor(elemType(right), b, i)
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $getA * $getB;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
