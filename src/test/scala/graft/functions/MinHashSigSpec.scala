package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup
import graft.sources.Tables

class MinHashSigSpec extends SparkSpec {

  private def sigMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  private def relMap(df: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Seq[Long]] =
    df.collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong(_))).toMap

  test("MinHashSigExpr equals the relational explode+aggregate form on testdata") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val expr = sigMap(Dedup.minhashSig(docs, "doc_id", "text", n = 3, k = 64))
    val rel = relMap(
      Dedup.minhashTableRelational(docs, "doc_id", "text", n = 3, k = 64)
        .select(col("id") +: (0 until 64).map(i => col(s"m$i")): _*), 64)
    assert(expr == rel)
  }

  test("whitespace edge cases match: empty, tabs, trailing separators, short texts") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, ""),                 // empty → one empty shingle
      (2L, "  one two  "),      // ASCII-space trim
      (3L, "\tone two three"),  // leading tab survives trim → leading empty token
      (4L, "one two three\t"),  // trailing separator → trailing empty token
      (5L, "one two"),          // fewer than n tokens
      (6L, "a b c d e f"),      // normal case with distinct shingles
      (7L, "a a a a a a")       // repeated shingles collapse (distinct)
    ).toDF("id", "text")
    val expr = sigMap(Dedup.minhashSig(df, "id", "text", n = 3, k = 8))
    val rel = relMap(
      Dedup.minhashTableRelational(df, "id", "text", n = 3, k = 8)
        .select(col("id") +: (0 until 8).map(i => col(s"m$i")): _*), 8)
    assert(expr == rel)
  }

  test("minhash_sig resolves in SQL") {
    Functions.register(spark)
    val got = spark.sql("SELECT minhash_sig('the quick brown fox', 3, 16)")
      .collect().head.getSeq[Long](0)
    assert(got.length == 16)
  }
}
