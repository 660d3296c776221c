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
}
