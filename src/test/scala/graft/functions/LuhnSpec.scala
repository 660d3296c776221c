package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Pins `luhn_sum` (the codegen'd byte-loop expression) against known
  * card numbers and the interpreted transform/aggregate HOF baseline
  * over random digit strings. */
class LuhnSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def sum(s: String): Long =
    Luhn.luhnSum(UTF8String.fromString(s))

  private def valid(s: String): Boolean = sum(s) % 10 == 0

  /** Scala reference: strip non-digits, classic right-to-left fold. */
  private def ref(s: String): Long = {
    val ds = s.filter(_.isDigit).map(_ - '0').reverse
    ds.zipWithIndex.map { case (d, i) =>
      if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
    }.map(_.toLong).sum
  }

  test("known card numbers validate; off-by-one digits fail") {
    assert(valid("4539148803436467"))   // Visa test number
    assert(!valid("4539148803436468"))
    assert(valid("79927398713"))        // the canonical Luhn example
    assert(!valid("79927398714"))
    // formatting characters are skipped in place
    assert(valid("4539-1488-0343-6467"))
    assert(valid("4539 1488 0343 6467"))
    assert(sum("4539-1488-0343-6467") == sum("4539148803436467"))
  }

  test("edge cases: empty, digit-less, single digit, null") {
    assert(sum("") == 0L)
    assert(sum("no digits here!") == 0L)
    assert(sum("7") == 7L)
    assert(Luhn.luhnSum(UTF8String.fromString("0")) == 0L)
  }

  test("matches the Scala reference on random mixed strings") {
    val g = Gen.stringOf(Gen.oneOf(Gen.numChar, Gen.alphaChar, Gen.const('-')))
    (samples(g) ++ samples(Gen.numStr, 100)).foreach { s =>
      assert(sum(s) == ref(s), s"input=$s")
    }
  }

  test("expression == interpreted HOF baseline through the engine; null passthrough") {
    val s = spark; import s.implicits._
    Functions.register(s)
    val rows = (samples(Gen.numStr, 80).filter(_.nonEmpty) ++
      Seq("4539148803436467", "79927398713")).toDF("dg")
    val both = rows
      .withColumn("a", call_function("luhn_sum", col("dg")))
      .withColumn("b", expr(
        """aggregate(transform(sequence(1, length(dg)), i ->
          |  CASE WHEN i % 2 = 0
          |       THEN IF(CAST(substring(dg, length(dg) - i + 1, 1) AS INT) * 2 > 9,
          |               CAST(substring(dg, length(dg) - i + 1, 1) AS INT) * 2 - 9,
          |               CAST(substring(dg, length(dg) - i + 1, 1) AS INT) * 2)
          |       ELSE CAST(substring(dg, length(dg) - i + 1, 1) AS INT) END),
          |  0L, (acc, v) -> acc + v)""".stripMargin))
      .collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), r.getString(0)))
    val n = Seq[String](null).toDF("dg")
      .select(call_function("luhn_sum", col("dg"))).head()
    assert(n.isNullAt(0))
  }
}
