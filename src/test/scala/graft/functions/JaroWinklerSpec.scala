package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

import scala.util.Random

class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("goldens pinned to DuckDB jaro_winkler_similarity") {
    // values taken verbatim from DuckDB 1.x output for the same pairs
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964)
    assert(jw("hello world", "hello wrold") == 0.9818181818181818)
    assert(jw("pale", "bale") == 0.8333333333333334)
    assert(jw("corn", "chicory") == 0.46428571428571425)
    assert(jw("aluminium", "alumina") == 0.9047619047619048)
  }

  test("non-ASCII follows DuckDB's byte semantics (goldens from DuckDB 1.x)") {
    assert(jw("café", "cafe") == 0.8483333333333334)
    assert(jw("ñandú", "nandu") == 0.6761904761904761)
    assert(jw("смысл", "мысль") == 0.7851851851851852)
    assert(jw("日本語", "日本") == 0.9333333333333333)
    assert(jw("aé", "aè") == 0.8222222222222222)
    assert(jw("café", "café") == 1.0)
  }

  test("edge conventions: empty is 0.0 (both-empty too, DuckDB's rule), equal is 1.0") {
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("", "a") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("ab", "ba") == 0.0) // window 0: no matches possible
    assert(jw("x", "y") == 0.0)
  }

  test("symmetric, bounded, and prefix boost only above 0.7") {
    val rnd = new Random(11)
    val words = Vector("almond", "antique", "aquamarine", "azure", "beige", "bisque",
      "blanched", "blue", "blush", "brown", "burlywood", "burnished")
    for (_ <- 1 to 200) {
      val a = Seq.fill(1 + rnd.nextInt(3))(words(rnd.nextInt(words.size))).mkString(" ")
      val b = Seq.fill(1 + rnd.nextInt(3))(words(rnd.nextInt(words.size))).mkString(" ")
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"($a, $b) -> $s")
      assert(s == jw(b, a), s"asymmetric on ($a, $b)")
    }
  }

  test("resolves in SQL and runs inside codegen") {
    val df = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS s")
    assert(df.head.getDouble(0) == 0.9611111111111111)
  }

  test("length-ratio prune is sound: max>=2*min byte lengths can never score > 0.9") {
    // the x1_jaro_linkage prune rests on: jw > 0.9 ⇒ jaro > 5/6 (boost
    // cap 0.4) ⇒ min/max > 1/2 (m ≤ min matches). Adversarial search
    // for a counterexample: highly-overlapping strings at exactly the
    // pruned ratio, plus random ASCII/multibyte pairs.
    def jw(a: String, b: String): Double =
      JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))
    // worst case for the bound: b = a duplicated (every byte of a
    // matches, maximal prefix) at every pruned ratio
    for (n <- 1 to 40; k <- Seq(2 * n, 2 * n + 1, 3 * n)) {
      val a = "abcdefghij" * 4
      val s1 = a.take(n)
      val s2 = (a * 8).take(k)
      assert(jw(s1, s2) <= 0.9, s"pruned pair scored >0.9: n=$n k=$k sim=${jw(s1, s2)}")
    }
    val rnd = new Random(7)
    (1 to 2000).foreach { _ =>
      val n = 1 + rnd.nextInt(20)
      val s1 = Seq.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString // tiny alphabet: max overlap
      val s2 = Seq.fill(2 * n + rnd.nextInt(10))(('a' + rnd.nextInt(4)).toChar).mkString
      val sim = jw(s1, s2)
      assert(sim <= 0.9, s"pruned pair scored >0.9: '$s1' '$s2' $sim")
    }
    // and the prune keeps real matches: a barely-surviving ratio pair
    assert(jw("martha", "marthaxx") > 0.9) // 6 vs 8 bytes, ratio 0.75
  }
}
