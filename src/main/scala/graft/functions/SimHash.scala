package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 63-bit SimHash over character n-gram shingles — the
  * codegen'd replacement for the relational explode + 63-accumulator
  * aggregate form (`Dedup.simhashRelational`, kept as the spec
  * oracle).
  *
  * Semantics are IDENTICAL to the relational form (SimHashSpec pins
  * equality on testdata + unicode/short/empty edges): shingles are
  * every charN-character window WITH multiplicity (texts shorter than
  * charN degrade to one whole-text shingle); each shingle's 64-bit
  * value is Spark's `xxhash64` (XXH64, seed 42) over the window's
  * UTF-8 bytes; bit i of the result is set iff more shingles have bit
  * i set than clear; bit 63 stays zero (63 usable bits).
  *
  * Why an expression: the relational form materializes ~|text| shingle
  * STRINGS per document (explode → substring allocation → shuffle into
  * a 63-accumulator hash aggregate), then the self-joins in pair
  * search recompute it per side. This walks the document's bytes once
  * — char windows are (offset, len) slices hashed in place, counters
  * live in one stack array — turning the whole signature stage into a
  * scan-local projection that fuses into whole-stage codegen. Per-doc
  * work is O(|text|·bits) integer ops with zero allocation beyond two
  * small arrays, and NOTHING shuffles before the bucket explode. */
object SimHash {
  /** Static worker shared by interpreted eval and generated code. */
  def simhash64(input: UTF8String, charN: Int, bits: Int): Long = {
    val numBytes = input.numBytes
    val base = input.getBaseObject
    val off = input.getBaseOffset
    // char-start byte offsets (UTF-8 is variable-width; windows are in
    // CHARS to match substr semantics in the relational form)
    val offsets = new Array[Int](numBytes + 2)
    var nChars = 0
    var i = 0
    while (i < numBytes) {
      offsets(nChars) = i
      i += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + i))
      nChars += 1
    }
    offsets(nChars) = numBytes
    val counts = new Array[Int](bits)
    def add(h: Long): Unit = {
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    if (nChars >= charN) {
      var s = 0
      val last = nChars - charN
      while (s <= last) {
        val bo = offsets(s)
        add(XXH64.hashUnsafeBytes(base, off + bo, offsets(s + charN) - bo, 42L))
        s += 1
      }
    } else {
      add(XXH64.hashUnsafeBytes(base, off, numBytes, 42L))
    }
    var result = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) result |= 1L << b
      b += 1
    }
    result
  }
}

case class SimHashExpr(child: Expression, charN: Int = 5, bits: Int = 63)
    extends UnaryExpression {
  require(charN >= 1 && bits >= 1 && bits <= 63)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash.simhash64(input.asInstanceOf[UTF8String], charN, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.simhash64($c, $charN, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}
