package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Mondrian k-anonymization invariants: the k guarantee holds on
  * every output partition, rows are conserved, identical
  * quasi-identifiers never split, the greedy median recursion lands
  * the hand-computable fixture exactly, and extra rounds past the
  * fixpoint are the identity (what lets a fixed unroll serve as the
  * oracle). */
class MondrianSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("a", "b")
  }

  test("identical quasi-identifiers never split (zero range)") {
    val out = Mondrian.anonymize(df(Seq.fill(8)((5L, 3L))), "a", "b", k = 2, rounds = 6)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 8L)
  }

  test("1..8 on one attribute splits to four pairs (hand-computed recursion)") {
    val out = Mondrian.anonymize(df((1L to 8L).map(i => (i, 0L))), "a", "b",
        k = 2, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    // medians: 4 → {1..4},{5..8}; then 2 and 6 → pairs
    assert(out.toSeq == Seq((2L, 1L, 2L), (2L, 3L, 4L), (2L, 5L, 6L), (2L, 7L, 8L)))
  }

  test("k guarantee and row conservation on testdata customers") {
    val c = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(round(col("c_acctbal") * 100).cast("long").as("bal"),
        col("c_nationkey").cast("long").as("nat"))
    val total = c.count()
    val out = Mondrian.anonymize(c, "bal", "nat", k = 10, rounds = 14).collect()
    assert(out.map(_.getLong(0)).sum == total)
    assert(out.forall(_.getLong(0) >= 10L), "every partition must keep >= k rows")
    assert(out.length > 1, "the corpus must actually split")
  }

  test("histogram and rank-apparatus median paths agree (r13 optimization)") {
    val c = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(round(col("c_acctbal") * 100).cast("long").as("bal"),
        col("c_nationkey").cast("long").as("nat"))
    // histMaxGroup = 0 forces the range-shuffle rank apparatus every
    // round (every group has >= 1 row); the default takes the
    // histogram path throughout at this scale. Same ids, same rows.
    def run(t: Long) = Mondrian.partitionIds(c, "bal", "nat", k = 10,
        rounds = 14, histMaxGroup = t)
      .groupBy("mpid").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    assert(run(Mondrian.HistMaxGroup) == run(0L))
  }

  test("rounds past the fixpoint are the identity") {
    val c = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(round(col("c_acctbal") * 100).cast("long").as("bal"),
        col("c_nationkey").cast("long").as("nat"))
    def canon(r: Int) = Mondrian.anonymize(c, "bal", "nat", k = 10, rounds = r)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._2, t._3, t._4, t._5)).toSeq
    assert(canon(14) == canon(16))
  }
}
