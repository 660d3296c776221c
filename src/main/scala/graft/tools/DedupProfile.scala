package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Throwaway stage profiler for the dedup family at sf0.1. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    // warm
    docs.count()
    val sims = Dedup.simhash(docs, "doc_id", "text", charN = 5)
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      time("simhash_expr")(Dedup.simhash(docs, "doc_id", "text", charN = 5).count())
      time("simhash_rel")(Dedup.simhashRelational(docs, "doc_id", "text", charN = 5).count())
      time("banded_pairs")(Dedup.simhashNearPairsBanded(sims, 6).count())
      val cands = Dedup.simhashNearPairsBanded(sims, 6).select("idA", "idB")
      time("verify")(Dedup.verifyPairs(cands, docs, "doc_id", "text", n = 3).count())
      time("ppjoin_nocap")(Dedup.prefixFilteredNgram(docs, "doc_id", "text", maxDf = 0).count())
      time("ppjoin_cap64")(Dedup.prefixFilteredNgram(docs, "doc_id", "text").count())
      time("ppjoin_cap16")(Dedup.prefixFilteredNgram(docs, "doc_id", "text", maxDf = 16).count())
    }
    spark.stop()
  }
}
