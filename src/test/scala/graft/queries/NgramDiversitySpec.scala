package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins `x3_ngram_diversity` against a driver-side recount: per
  * (source, n) the gram totals, distinct counts, and ppm ratio from
  * plain Scala sliding windows over the collected token arrays. */
class NgramDiversitySpec extends SparkSpec {

  test("distinct-n-gram ratios == driver-side sliding-window recount (sf0.001)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(s, dir)
      .select(col("source"), graft.functions.TextAnalysis.tokens(col("text")).as("w"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))

    val want = (for {
      n <- 1 to 3
      (src, grams) <- docs.groupBy(_._1).view.mapValues(
        _.flatMap(d => d._2.sliding(n).filter(_.length == n).map(_.mkString(" "))))
    } yield (src, n.toLong, grams.size.toLong, grams.distinct.size.toLong,
      grams.distinct.size.toLong * 1000000L / grams.size))
      .toSeq.sortBy(t => (t._1, t._2))

    val got = TextQueries.all("x3_ngram_diversity")(s, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    // diversity must fall with n on natural-ish text: trigrams repeat
    // less than unigrams, so distinct_ppm rises with n
    got.groupBy(_._1).foreach { case (src, rows) =>
      val byN = rows.sortBy(_._2).map(_._5)
      assert(byN(0) <= byN(1) && byN(1) <= byN(2),
        s"$src: distinct ratio should be monotone in n: $byN")
    }
  }
}
