package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave of two int keys — `zorder2(x, y)`
  * returns the 64-bit value whose even bits are x's and odd bits are
  * y's, after biasing each signed int so that signed order matches
  * unsigned bit order.
  *
  * Sorting a table by this value clusters rows that are close in BOTH
  * dimensions into the same files, so parquet min/max stats can skip
  * files for predicates on EITHER column — a single-column sort only
  * ever skips on its own column, and a predicate on the second column
  * degenerates to a full scan. This is the standard lakehouse layout
  * trick for multi-dimensional scans (DataBricks/Delta OPTIMIZE
  * ZORDER, Hudi/Iceberg z-ordering); the layout step pays one range
  * shuffle, once, at write time (`Partitioning.zorderWrite`).
  *
  * Reference analogue: none (the reference's SQLite PK index is
  * single-dimension, sql_config.yaml:4-51); engine completeness for
  * the 100 TB layout toolkit.
  */
object ZOrder {

  /** Spread the lower 32 bits of v into the even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Static worker shared by interpreted eval and generated code.
    * The per-input sign-bit flip maps signed ints monotonically onto
    * unsigned 32-bit space (negative keys z-order correctly); the
    * final bit-63 flip makes SIGNED long comparison of the result
    * equal unsigned Morton order — bit 63 is y's biased sign bit, and
    * without the flip the y axis would invert across zero under the
    * signed sort that range partitioning uses. */
  def interleave(x: Int, y: Int): Long =
    (spread((x ^ 0x80000000).toLong & 0xFFFFFFFFL) |
      (spread((y ^ 0x80000000).toLong & 0xFFFFFFFFL) << 1)) ^ Long.MinValue
}

case class ZOrder2Expr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder2 requires (int, int), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.interleave(x.asInstanceOf[Int], y.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrder.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2Expr =
    copy(left = newLeft, right = newRight)
}
