package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins for the weighted all-pairs similarity (TfIdf): the prefix
  * filter must be LOSSLESS (same output as the quadratic baseline)
  * while actually pruning the candidate join. */
class TfIdfSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def key(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("idA"), r.getAs[Long]("idB"), r.getAs[Long]("dot"))

  test("prefix-filtered pairs equal the quadratic all-pairs baseline") {
    val docs = Tables.documents(spark, dir)
    val fast = TfIdf.cosinePairs(docs, "doc_id", "text", n = 3, simT = 0.5)
      .collect().map(key).toSet
    val slow = TfIdf.cosinePairsAllPairs(docs, "doc_id", "text", n = 3, simT = 0.5)
      .collect().map(key).toSet
    assert(fast == slow, s"filtered=${fast.size} vs all-pairs=${slow.size}")
    assert(fast.nonEmpty, "fixture must contain qualifying pairs")
  }

  test("the prefix really prunes: indexed terms are a strict subset of all terms") {
    val docs = Tables.documents(spark, dir)
    val wt = TfIdf.weights(docs, "doc_id", "text", n = 3)
    val total = wt.count()
    // reproduce the operator's prefix selection
    val n2 = wt.groupBy("id").agg(sum(col("w") * col("w")).as("n2"))
    val tail = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      .orderBy(col("df").asc, col("tok").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val prefix = wt.join(n2, "id")
      .withColumn("tail2", sum((col("w") * col("w")).cast("double") / col("n2")).over(tail))
      .filter(col("tail2") >= 0.5 * 0.5 - 1e-9)
      .count()
    assert(prefix < total, s"prefix=$prefix must be < total=$total")
  }

  test("weights: tf counts repeats, df counts docs, idf is integer reciprocal") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b c a b c x y z"),   // trigram "a b c" occurs twice
      (2L, "a b c q r s")).toDF("doc_id", "text")
    val wt = TfIdf.weights(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("tok")) ->
        (r.getAs[Long]("w"), r.getAs[Long]("df"))).toMap
    // "a b c" in doc 1: tf=2, df=2 -> w = 2 * (100000 div 2) = 100000
    assert(wt((1L, "a b c")) == (100000L, 2L))
    // "a b c" in doc 2: tf=1, df=2 -> w = 50000
    assert(wt((2L, "a b c")) == (50000L, 2L))
    // "q r s" only in doc 2: tf=1, df=1 -> w = 100000
    assert(wt((2L, "q r s")) == (100000L, 1L))
  }
}
