package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins `x3_textrank` against an independent driver-side reference:
  * the same window-2 co-occurrence graph and the same 4-round integer
  * power iteration computed with plain Scala maps over the collected
  * token stream (sf0.001) must reproduce the distributed result
  * exactly — every contribution (r·w) div wdeg, damping ×85 div 100. */
class TextrankSpec extends SparkSpec {

  test("distributed TextRank == driver-side reference fold (sf0.001)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(graft.functions.TextAnalysis.tokens(col("text")))
        .as(Seq("pos", "tok")))
      .filter(length(col("tok")) >= 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))

    // window-2 undirected weighted edges
    val byDoc = toks.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1))
    val w = collection.mutable.Map.empty[(String, String), Long]
    for ((_, seq) <- byDoc; i <- seq.indices; j <- (i + 1) until seq.length
         if seq(j)._1 - seq(i)._1 >= 1 && seq(j)._1 - seq(i)._1 <= 2
         if seq(i)._2 != seq(j)._2) {
      val (a, b) = (seq(i)._2, seq(j)._2)
      w((a, b)) = w.getOrElse((a, b), 0L) + 1L
      w((b, a)) = w.getOrElse((b, a), 0L) + 1L
    }
    val wdeg = w.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    var r = wdeg.map { case (n, _) => n -> 1000000L }
    for (_ <- 1 to 4) {
      val in = collection.mutable.Map.empty[String, Long]
      for (((u, v), ww) <- w)
        in(v) = in.getOrElse(v, 0L) + (r(u) * ww) / wdeg(u)
      r = r.map { case (n, _) => n -> (150000L + (in.getOrElse(n, 0L) * 85L) / 100L) }
    }
    val want = r.toSeq.sortBy { case (t, sc) => (-sc, t) }.take(20)

    val got = TextQueries.all("x3_textrank")(s, dir)
      .collect().map(row => (row.getString(0), row.getLong(1))).toSeq
    assert(got == want, s"got ${got.take(5)}... want ${want.take(5)}...")
  }
}
