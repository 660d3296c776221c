package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup
import graft.sources.Tables

/** Throwaway timing for the cluster-label query path at sf0.1. */
object ClusterProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count()
    for (r <- 1 to 2) {
      var t0 = System.nanoTime()
      val pairs = Dedup.prefixFilteredNgram(docs, "doc_id", "text", n = 3).select("idA", "idB")
      val n1 = pairs.count()
      println(f"PROF pairs round $r: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n1)")
      t0 = System.nanoTime()
      val n2 = Dedup.clusterLabels(docs, "doc_id", pairs).count()
      println(f"PROF clusterLabels round $r: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n2)")
    }
    spark.stop()
  }
}
