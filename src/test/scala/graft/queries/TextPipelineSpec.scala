package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis
import graft.sources.Tables

/** Invariants for the training-pipeline text queries that the DuckDB
  * oracle can't express directly (conservation / structure checks on
  * real testdata). */
class TextPipelineSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("x3_pack_sequences: token conservation and contiguous bins per lang") {
    val out = TextQueries.all("x3_pack_sequences")(spark, dir).collect()
    val totalPacked = out.map(_.getAs[Long]("total_tokens")).sum
    val totalDocs = Tables.documents(spark, dir)
      .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(totalPacked == totalDocs, "packing must conserve tokens")
    // bins per lang are 0..max with no gaps (cumsum can only grow by
    // one doc at a time, and bin indexes are cum div budget)
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val bins = rows.map(_.getAs[Long]("bin")).sorted
      assert(bins.head == 0L, s"$lang: first bin must be 0")
    }
  }

  test("x3_chunking: stride-16 windows cover every token, last chunk ragged") {
    val out = TextQueries.all("x3_chunking")(spark, dir).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    val docTokens = Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (docId, chunks) =>
      val n = docTokens(docId)
      val expected = (n - 1) / 16 + 1
      assert(chunks.length == expected, s"doc $docId: ${chunks.length} chunks for $n tokens")
      // chunk k spans tokens [k*16+1, min(k*16+32, n)]
      chunks.foreach { c =>
        val k = c.getAs[Long]("chunk_id")
        assert(c.getAs[Long]("n_tok") == math.min(32L, n - k * 16))
      }
    }
  }

  test("x3_repetition: planted repetitive doc scores above clean doc") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val base = docs.select(
      col("doc_id"),
      TextAnalysis.dupWordCount(TextAnalysis.tokens(col("text"))).as("dup"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base(1L) == 5L && base(2L) == 0L)
  }
}
