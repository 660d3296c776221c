package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.Functions.normalize_text

/** Golden pairs pinned to the reference semantics
  * (/root/reference/scrapper.py:20-26, FIXTURES.md §A3): Python
  * NFKD → ASCII-ignore → lower → space→underscore, null passthrough. */
class NormalizeTextSpec extends SparkSpec {

  /** Deterministic sample stream from a Gen (no scalatestplus bridge
    * in the offline cache, so we drive scalacheck by hand). */
  protected def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def norm(s: String): String = {
    val r = NormalizeText.normalize(if (s == null) null else UTF8String.fromString(s))
    if (r == null) null else r.toString
  }

  test("golden pairs from the reference boroughs") {
    assert(norm("Álvaro Obregón") == "alvaro_obregon")
    assert(norm("Coyoacán") == "coyoacan")
    assert(norm("Tláhuac") == "tlahuac")
    assert(norm("ñ") == "n")
    assert(norm("09:00") == "09:00")
    assert(norm("Gustavo A. Madero") == "gustavo_a._madero")
    assert(norm("MUY BUENA") == "muy_buena")
    assert(norm("") == "")
    assert(norm(null) == null)
  }

  test("idempotence: f(f(x)) == f(x)") {
    val unicodeStr = Gen.stringOf(Gen.choose(Char.MinValue, '퟿'))
    (samples(Gen.asciiPrintableStr) ++ samples(unicodeStr, 100) ++
      Seq("Álvaro Obregón", "Ñandú ÁÉÍÓÚ üöä", "ß straße")).foreach { s =>
      assert(norm(norm(s)) == norm(s), s"not idempotent on ${s.map(_.toInt)}")
    }
  }

  test("interpreted eval and codegen agree through the DataFrame API") {
    val spark2 = spark
    import spark2.implicits._
    Functions.register(spark2)
    val in = Seq("Álvaro Obregón", "Coyoacán", "MUY Buena", "a  b", null)
    val viaPlan = in.toDF("s").select(normalize_text($"s")).as[String].collect()
    assert(viaPlan.toSeq == in.map(norm))
  }

  test("constant folds: literal input needs no input columns") {
    val spark2 = spark
    import spark2.implicits._
    Functions.register(spark2)
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val plan = Seq(1).toDF("x")
      .select(expr("normalize_text('Álvaro Obregón')").as("n"))
      .queryExecution.optimizedPlan
    // ConstantFolding evaluates the expression at plan time, then
    // ConvertToLocalRelation collapses the whole projection — no
    // normalize_text call survives into the physical plan.
    plan match {
      case lr: LocalRelation =>
        assert(lr.data.head.getUTF8String(0).toString == "alvaro_obregon")
      case other => fail(s"expected fully folded LocalRelation, got: $other")
    }
  }
}
