package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature over distinct word n-gram shingles —
  * the codegen'd replacement for the relational explode + k-min-
  * accumulator aggregate (`Dedup.minhashTableRelational`, kept as the
  * spec oracle). Returns array<long> of length k where element i =
  * min over shingles of Spark's `xxhash64(xxhash64(shingle), i)`.
  *
  * Semantics replicate the relational form EXACTLY (MinHashSigSpec
  * pins equality, including whitespace edge cases):
  * tokens = split(trim(text), "\\s+") with Spark's ASCII-32-only trim
  * and trailing-empty-preserving split; shingles = distinct runs of n
  * tokens joined by one space (fewer than n tokens ⇒ one shingle of
  * all tokens joined); shingle hash = xxhash64 over UTF-8 bytes
  * (seed 42); per-seed derivation hashes the 8-byte gh, not the
  * string, mirroring the relational form's optimization.
  *
  * Why an expression: the relational form explodes ~|tokens| shingle
  * strings per doc through a shuffle into a k-accumulator hash
  * aggregate, and every LSH self-join side recomputes it. This emits
  * the whole signature as one scan-local projection value — the
  * signature stage stops shuffling entirely. */
object MinHashSig {

  /** Static worker shared by interpreted eval and generated code.
    * Shingling is `WordNgrams.wordShingles` — the single shared
    * replication of Spark's trim/split/distinct semantics. */
  def compute(input: UTF8String, n: Int, k: Int): ArrayData = {
    val shingles = WordNgrams.wordShingles(input, n)
    val mins = Array.fill(k)(Long.MaxValue)
    val it = shingles.iterator()
    while (it.hasNext) {
      val bytes = it.next().getBytes(StandardCharsets.UTF_8)
      val gh = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      // xxhash64(gh, i) = hashInt(i, hashLong(gh, 42)) — hoist the
      // gh-dependent half out of the k-loop
      val base = XXH64.hashLong(gh, 42L)
      var i = 0
      while (i < k) {
        val h = XXH64.hashInt(i, base)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSigExpr(child: Expression, n: Int = 3, k: Int = 64)
    extends UnaryExpression {
  require(n >= 1 && k >= 1)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}
