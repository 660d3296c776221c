package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup
import graft.sources.Tables

class WordNgramsSpec extends SparkSpec {

  private def gramMap(df: org.apache.spark.sql.DataFrame, grams: org.apache.spark.sql.Column)
      : Map[Long, Seq[String]] = {
    df.select(col("id"), grams.as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
  }

  test("WordNgramsExpr equals the HOF pipeline on testdata (order included)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").as("id"), col("text"))
    val expr = gramMap(docs, Dedup.wordGrams(col("text"), 3))
    val hof = gramMap(docs, Dedup.wordGramsHof(col("text"), 3))
    assert(expr == hof)
  }

  test("whitespace/short-text edges match the HOF pipeline") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, ""), (2L, "  one two  "), (3L, "\tone two three"),
      (4L, "one two three\t"), (5L, "one two"),
      (6L, "a b c d a b c d"),  // repeated shingles → distinct, first-occurrence order
      (7L, "solo")
    ).toDF("id", "text")
    val expr = gramMap(df, Dedup.wordGrams(col("text"), 3))
    val hof = gramMap(df, Dedup.wordGramsHof(col("text"), 3))
    assert(expr == hof)
  }
}
