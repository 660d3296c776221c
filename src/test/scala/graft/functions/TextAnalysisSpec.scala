package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis._

class TextAnalysisSpec extends SparkSpec {

  test("tokens: codegen form equals the HOF filter form on blanks and edges") {
    val s = spark; import s.implicits._
    val fixtures = Seq("", " ", "   ", "\t\n", "a", " a ", "a b", "  a   b  ",
      "a\tb\nc", "the  quick brown", "!", " ! ? ")
    val df = fixtures.toDF("t")
    val got = df.select(tokens($"t")).as[Seq[String]].collect().toSeq
    val ref = df.select(filter(split(trim($"t"), "\\s+"), x => x =!= ""))
      .as[Seq[String]].collect().toSeq
    assert(got == ref)
    assert(got.head.isEmpty && got(4) == Seq("a"))
  }

  test("langId: stopword and CJK heuristics") {
    val s = spark; import s.implicits._
    val got = Seq(
      "the cat sat on the mat and it is fine",   // en
      "el perro y la casa de que en un por",     // es
      "der hund und die katze ist von mit",      // de
      "你好 世界 data pipeline",                  // zh (CJK wins)
      "spark table hash join"                    // no signal → en fallback
    ).toDF("t").select(langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "es", "de", "zh", "en"))
  }

  test("quality features: alphaPct integer division, punct count, gate") {
    val s = spark; import s.implicits._
    val df = Seq("abc def!", "", "!!! ???").toDF("t")
    val rows = df.select(alphaPct($"t"), punctCount($"t"), isGoodDoc($"t")).collect()
    assert(rows(0).getLong(0) == 75L)  // 6 alpha / 8 chars → 75
    assert(rows(1).getLong(0) == 0L)
    assert(rows(2).getLong(1) == 6L && !rows(2).getBoolean(2))
  }

  test("bpeishCount: letter runs, digit runs, single symbols") {
    val s = spark; import s.implicits._
    val got = Seq("hello world42!", "a-b_c", "").toDF("t")
      .select(bpeishCount($"t")).as[Long].collect().toSeq
    // hello|world|42|! = 4 ; a|-|b|_|c = 5 ; "" = 0
    assert(got == Seq(4L, 5L, 0L))
  }

  test("PII redaction: emails and phones replaced, counts match") {
    val s = spark; import s.implicits._
    val df = Seq(
      "mail me at bob.smith+x@corp.example.com or call 555-0042 today",
      "two mails a@b.co c@d.org and fake phone 555-12345 long",
      "nothing sensitive here").toDF("t")
    val rows = df.select(redactPii($"t"), piiEmailCount($"t"), piiPhoneCount($"t")).collect()
    assert(rows(0).getString(0) == "mail me at [EMAIL] or call [PHONE] today")
    assert(rows(0).getLong(1) == 1L && rows(0).getLong(2) == 1L)
    // 555-12345: \b after 4 digits fails (digit follows) → not a phone
    assert(rows(1).getLong(1) == 2L && rows(1).getLong(2) == 0L)
    assert(rows(2).getString(0) == "nothing sensitive here")
  }

  test("repetition: bigram multiset keeps duplicates, dupWordCount exact") {
    val s = spark; import s.implicits._
    val df = Seq("a b a b a", "x", "").toDF("t")
    val rows = df.select(wordBigramsAll($"t"), dupWordCount(tokens($"t"))).collect()
    // "a b a b a" → bigrams WITH multiplicity: a b, b a, a b, b a
    assert(rows(0).getSeq[String](0) == Seq("a b", "b a", "a b", "b a"))
    assert(rows(0).getLong(1) == 3L) // 5 tokens, 2 distinct
    assert(rows(1).getSeq[String](0).isEmpty && rows(1).getLong(1) == 0L)
    assert(rows(2).getSeq[String](0).isEmpty)
  }

  test("fingerprints: md5 stability and winnow robustness to distant edits") {
    val s = spark; import s.implicits._
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val df = Seq(base, base + " tail_change", "completely different words here now ok yes").toDF("t")
    val rows = df.select(fingerprint($"t"), winnowFingerprint($"t", 5)).collect()
    assert(rows(0).getString(0) != rows(1).getString(0)) // exact fp differs
    // winnow fp may or may not survive the tail edit, but must differ for unrelated text
    assert(rows(0).getString(1) != rows(2).getString(1))
    assert(rows(0).getString(0).matches("[0-9a-f]{32}"))
  }
}
