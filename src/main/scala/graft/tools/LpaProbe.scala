package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not part of the library surface): measure
  * Graph.labelPropagation's convergence depth on the co-purchase
  * graph per sf, and whether termination is a TRUE fixpoint or the
  * period-2 oscillation stop — the a16_communities_full oracle can
  * only unroll-with-margin past a true fixpoint (rounds are
  * idempotent there; an oscillating pair would keep flipping). */
object LpaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (sf <- args.toSeq) {
      val dir = s"/root/testdata/$sf"
      val items = graft.sources.Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_partkey").distinct()
      val minN = sys.env.getOrElse("LPA_MIN_PAIR_N", "1").toInt
      val pairs = items.toDF("l_orderkey", "a")
        .join(items.toDF("l_orderkey", "b"), Seq("l_orderkey"))
        .filter($"a" < $"b").groupBy($"a", $"b").agg(count(lit(1)).as("n"))
        .filter($"n" >= minN).select($"a", $"b")
      val und = pairs.select($"a".as("u"), $"b".as("v"))
        .union(pairs.select($"b".as("u"), $"a".as("v"))).localCheckpoint(true)
      var labels = und.select($"u".as("node")).distinct()
        .select($"node", $"node".as("label")).localCheckpoint(true)
      def sig(l: org.apache.spark.sql.DataFrame) = {
        val r = l.agg(count(lit(1)),
          sum(xxhash64($"node", $"label").cast("decimal(38,0)"))).head()
        (r.getLong(0), BigDecimal(r.getDecimal(1)))
      }
      var prev = sig(labels)
      var prev2: Option[(Long, BigDecimal)] = None
      var it = 0
      var mode = "none"
      while (mode == "none" && it < 50) {
        val next = und
          .join(labels.select($"node".as("v"), $"label".as("lab")), Seq("v"))
          .groupBy($"u", $"lab").agg(count(lit(1)).as("c"))
          .groupBy($"u").agg(max(struct($"c", (-$"lab").as("nl"))).as("m"))
          .select($"u".as("node"), (-$"m.nl").as("label"))
          .localCheckpoint(true)
        val s = sig(next)
        if (s == prev) mode = "fixpoint"
        else if (prev2.contains(s)) mode = "oscillation"
        prev2 = Some(prev); prev = s; labels = next; it += 1
      }
      val nComm = labels.select($"label").distinct().count()
      println(s"LPAPROBE sf=$sf rounds=$it mode=$mode communities=$nComm")
    }
    spark.stop()
  }
}
