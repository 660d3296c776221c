package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis.tokens
import graft.sources.Tables

/** Properties of the dataset-mixture builder (x3_mixture) that the
  * row-hash oracle can't express: per-tier budget maximality and
  * layout invariance. */
class MixtureSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def selection = TextQueries.all("x3_mixture")(spark, dir)

  private def budgets: Map[Int, Long] =
    Map(0 -> 40L, 1 -> 30L, 2 -> 20L, 3 -> 10L).map { case (t, w) => t -> w * 200L }

  test("every tier stays within budget AND is maximal (the next doc would overflow)") {
    val s = spark; import s.implicits._
    val used = selection.groupBy($"tier").agg(sum($"tokens").as("used"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // per-doc view, in the exact selection order the query uses
    val t = Tables.documents(spark, dir).select(
      (expr("cast(substring(source, 4) as int)") % 4).as("tier"),
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tok"),
      md5(col("text")).as("h"))
    val w = Window.partitionBy(col("tier")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = t.withColumn("cum", sum(col("n_tok")).over(w)).collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(1), r.getLong(2), r.getLong(4)))
    for ((tier, budget) <- budgets) {
      val tierUsed = used.getOrElse(tier, 0L)
      assert(tierUsed <= budget, s"tier $tier used $tierUsed > budget $budget")
      // maximality: the first EXCLUDED doc (if any) would have pushed
      // the cumulative total over budget
      val ordered = cum.filter(_._1 == tier).sortBy(r => (r._2, r._3))
      val firstExcluded = ordered.find(_._5 > budget)
      firstExcluded.foreach { r =>
        assert(tierUsed + r._4 > budget,
          s"tier $tier excluded doc ${r._3} (${r._4} tok) though it fits: used $tierUsed, budget $budget")
      }
    }
  }

  test("selection is invariant to input partitioning") {
    val s = spark; import s.implicits._
    val base = selection.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // same query over an adversarially repartitioned (and re-sorted) input
    val shuffled = Tables.documents(spark, dir).repartition(7, col("doc_id"))
      .sortWithinPartitions(col("n_chars"))
    val t = shuffled.select(
      (expr("cast(substring(source, 4) as int)") % 4).as("tier"),
      col("source"), col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tok"),
      md5(col("text")).as("h"))
    val w = Window.partitionBy(col("tier")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val again = t.withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("budget_tok",
        (when(col("tier") === 0, 40L).when(col("tier") === 1, 30L)
          .when(col("tier") === 2, 20L).otherwise(10L)) * 200L)
      .filter(col("cum") <= col("budget_tok"))
      .groupBy(col("tier"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(again == base && base.nonEmpty)
  }
}
