package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles as a codegen'd expression — the
  * single-pass replacement for the `wordGrams` higher-order-function
  * pipeline (kept as `Dedup.wordGramsHof`, the spec oracle).
  *
  * Semantics replicate the HOF form EXACTLY (WordNgramsSpec pins
  * equality): tokens = split(trim(text), "\\s+") with Spark's
  * ASCII-32-only trim and trailing-empty-preserving split; shingles =
  * distinct FIRST-OCCURRENCE-ordered runs of n tokens joined by one
  * space; fewer than n tokens ⇒ one shingle of all tokens joined.
  *
  * Why an expression: Spark evaluates higher-order functions
  * interpreted (no codegen), and every dedup consumer — posting
  * explode, prefix filter, verify join sides — re-evaluates the whole
  * shingling pipeline per reference. One tight loop per row removes
  * that multiplier everywhere at once. */
object WordNgrams {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** Replicates Spark SQL `trim`: strips 0x20 only. */
  private def trimSpaces(s: String): String = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s.substring(lo, hi)
  }

  /** Distinct word n-gram shingles in first-occurrence order — the ONE
    * replication of Spark's trim/split/array_distinct semantics, shared
    * by WordNgramsExpr and MinHashSigExpr so the two can never drift
    * apart on a whitespace edge case. */
  private[functions] def wordShingles(input: UTF8String, n: Int): java.util.LinkedHashSet[String] = {
    val tokens = WS.split(trimSpaces(input.toString), -1)
    val shingles = new java.util.LinkedHashSet[String]()
    if (tokens.length >= n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      val last = tokens.length - n
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j))
          j += 1
        }
        shingles.add(sb.toString)
        i += 1
      }
    } else {
      shingles.add(String.join(" ", tokens: _*))
    }
    shingles
  }

  /** Static worker shared by interpreted eval and generated code. */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val shingles = wordShingles(input, n)
    val out = new Array[Any](shingles.size)
    val it = shingles.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}

case class WordNgramsExpr(child: Expression, n: Int = 3)
    extends UnaryExpression {
  require(n >= 1)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}
