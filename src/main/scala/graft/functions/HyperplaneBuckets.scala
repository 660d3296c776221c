package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All hyperplane-LSH bucket ids of a vector in ONE pass — the
  * codegen'd replacement for the explode(planes) → VecDot →
  * groupBy(id, t) pipeline (`Ann.bucketIndexRelational`, kept as the
  * spec oracle). Returns array<long> of length `tables`; element t is
  * the sign-bit bucket of table t.
  *
  * Why an expression: the relational form materializes tables·bits
  * rows PER VECTOR (≈576 with defaults) through a generator and then
  * shuffles them back into per-(id, table) buckets — the only shuffle
  * in the whole index build. One tight loop per row produces the same
  * longs as a pure projection: the index stage becomes shuffle-free
  * and the downstream explode is ×tables, not ×tables·bits.
  *
  * Determinism/equality: hyperplanes come from the same seeded
  * generator (`planes`, cached per executor); the per-bit dot
  * replicates VecDot's ascending-index double accumulation, so bucket
  * ids are bit-identical to the relational form (HyperplaneBucketsSpec
  * pins it). A vector of the wrong width or with null elements yields
  * null (the relational form's all-null-dot rows join-drop the same
  * way). */
object HyperplaneBuckets {

  /** Deterministic pseudo-random hyperplanes [table][bit][dim] — the
    * canonical generator (Ann.hyperplanes delegates here). */
  def planes(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Long), Array[Array[Array[Double]]]]()

  private def cached(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] =
    cache.computeIfAbsent((tables, bits, dim, seed),
      _ => planes(tables, bits, dim, seed))

  /** Static worker shared by interpreted eval and generated code. */
  def compute(vec: ArrayData, floatElems: Boolean,
      tables: Int, bits: Int, dim: Int, seed: Long): ArrayData = {
    val n = vec.numElements()
    if (n != dim) return null
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      v(i) = if (floatElems) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val ps = cached(tables, bits, dim, seed)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      val tp = ps(t)
      var b = 0L
      var bit = 0
      while (bit < bits) {
        val p = tp(bit)
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += v(j) * p(j); j += 1 }
        if (acc >= 0d) b |= 1L << bit
        bit += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }
}

case class HyperplaneBucketsExpr(child: Expression, tables: Int = 96, bits: Int = 6,
    dim: Int = 64, seed: Long = 42L) extends UnaryExpression {
  require(tables >= 1 && bits >= 1 && bits <= 63 && dim >= 1)

  private def floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  // null from non-null input (wrong width / null element) — see VecDot
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], floatElems, tables, bits, dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.HyperplaneBuckets.compute(
         |  $c, $floatElems, $tables, $bits, $dim, ${seed}L);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketsExpr =
    copy(child = newChild)
}
