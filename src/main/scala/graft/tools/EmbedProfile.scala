package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Ann
import graft.sources.Tables

/** Throwaway timing for the LSH-blocked pair search at sf0.1. */
object EmbedProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Functions.register(spark)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    emb.count()
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = Ann.nearDupPairs(emb, "vec_id", "embedding", k = 20).count()
      println(f"PROF nearDupPairs round $r: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    spark.stop()
  }
}
