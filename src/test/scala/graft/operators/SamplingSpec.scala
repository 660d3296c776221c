package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class SamplingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("splitColumn: stable membership, ~13/16 train, disjoint and exhaustive") {
    val docs = Tables.documents(spark, dir)
    val split = docs.select(col("doc_id"), Sampling.splitColumn(col("text")).as("s"))
    val counts = split.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") + counts("test") == 500)
    val frac = counts("train").toDouble / 500
    assert(frac > 0.70 && frac < 0.90, s"train frac $frac")
    // stability: same rows land in the same split on a re-run
    val again = docs.select(col("doc_id"), Sampling.splitColumn(col("text")).as("s"))
    assert(split.except(again).count() == 0)
  }

  test("stratifiedSample respects per-stratum fractions and determinism") {
    val docs = Tables.documents(spark, dir)
    val sampled = Sampling.stratifiedSample(docs, "text", "lang",
      Map("en" -> 0.5, "es" -> 0.1))
    val byLang = sampled.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == Set("en", "es")) // unlisted strata dropped
    val enFrac = byLang("en").toDouble / totals("en")
    val esFrac = byLang("es").toDouble / totals("es")
    assert(enFrac > 0.35 && enFrac < 0.65, s"en $enFrac")
    assert(esFrac > 0.02 && esFrac < 0.20, s"es $esFrac")
    assert(Sampling.stratifiedSample(docs, "text", "lang", Map("en" -> 0.5, "es" -> 0.1))
      .count() == sampled.count())
  }

  test("deterministicShuffle: same order every run, different per seed") {
    val docs = Tables.documents(spark, dir)
    def order(seed: Int) = Sampling.deterministicShuffle(docs, "text", seed)
      .select("doc_id").limit(20).collect().map(_.getLong(0)).toSeq
    assert(order(0) == order(0))
    assert(order(0) != order(1))
    assert(order(0) != docs.orderBy("doc_id").limit(20).collect().map(_.getLong(0)).toSeq)
  }
}
