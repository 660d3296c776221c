package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis

/** Property pins for the substring-dedup REWRITE (Lee et al. 2021)
  * that the DuckDB oracle's hash check can't express: the oracle
  * proves Spark and DuckDB agree on the rewritten bytes; this spec
  * proves the rewrite did what the paper says — every 13-gram that
  * was duplicated across documents is GONE from the rebuilt corpus,
  * and the query's own md5 matches an independent rebuild. */
class DedupRewriteSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Rebuild each doc's kept-token array independently of the query
    * under test (same marking rule, but materializing tokens instead
    * of hashing them). */
  private def rebuiltTokens() = {
    val d = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
    val toks = d.select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "tok")))
    val grams = d.select(col("doc_id"),
        explode(when(size(col("w")) >= 13,
          transform(sequence(lit(0), size(col("w")) - 13), p =>
            struct(p.as("p"),
              md5(concat_ws(" ", slice(col("w"), p + 1, lit(13))).cast("binary")).as("fp"))))
          .otherwise(array().cast("array<struct<p:int,fp:string>>"))).as("g"))
      .select(col("doc_id"), col("g.p").as("p"), col("g.fp").as("fp"))
    val dupFps = grams.groupBy("fp").agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("fp")
    val covered = grams.join(dupFps, "fp")
      .select(col("doc_id"), explode(sequence(col("p"), col("p") + 12)).as("cpos"))
      .distinct()
    val kept = toks.join(covered,
      toks("doc_id") === covered("doc_id") && toks("pos") === covered("cpos"),
      "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
        s => s.getField("tok")).as("kept"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val dup = dupFps.collect().map(_.getString(0)).toSet
    (rebuilt, dup)
  }

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("x1_dedup_rewrite: no originally-duplicated 13-gram survives, md5 matches independent rebuild") {
    val out = DedupQueries.all("x1_dedup_rewrite")(spark, dir).collect()
    val (rebuilt, dupFps) = rebuiltTokens()
    assert(dupFps.nonEmpty, "fixture must actually contain cross-doc duplicated 13-grams")
    var removedTotal = 0L
    out.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val kept = rebuilt.getOrElse(docId, Seq.empty)
      // conservation: n_tok = kept + removed
      assert(r.getAs[Long]("n_tok") == kept.length + r.getAs[Long]("n_removed"),
        s"doc $docId: token conservation broken")
      removedTotal += r.getAs[Long]("n_removed")
      // the query's clean_fp is the md5 of exactly these kept tokens
      assert(r.getAs[String]("clean_fp") == md5hex(kept.mkString(" ")),
        s"doc $docId: clean_fp diverges from independent rebuild")
      // the paper's contract: no 13-gram that was duplicated across
      // docs appears contiguously in the rebuilt text
      kept.sliding(13).filter(_.length == 13).foreach { g =>
        assert(!dupFps.contains(md5hex(g.mkString(" "))),
          s"doc $docId: duplicated 13-gram survived the rewrite")
      }
    }
    assert(removedTotal > 0L, "fixture duplication must remove at least one token")
  }
}
