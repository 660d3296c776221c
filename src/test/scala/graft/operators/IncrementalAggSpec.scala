package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import java.nio.file.{Files, Paths}
import scala.util.Random

class IncrementalAggSpec extends SparkSpec {

  private def freshStore(): TableStore = {
    val dir = Files.createTempDirectory(Paths.get("target"), "incragg-")
    new TableStore(dir.toString)
  }

  private def facts(rows: Seq[(Long, Double)]) = {
    val s = spark; import s.implicits._
    rows.toDF("k", "v")
  }

  private val measures = Seq(
    "n" -> count(lit(1)),
    "total" -> sum(col("v").cast(DecimalType(18, 6))).cast(DecimalType(38, 6)))

  private def state(store: TableStore): Map[Long, (Long, BigDecimal)] =
    store.read(spark, "agg").collect().map { r =>
      r.getAs[Long]("k") -> (r.getAs[Long]("n"), BigDecimal(r.getAs[java.math.BigDecimal]("total")))
    }.toMap

  test("folding random batch splits equals the one-shot aggregate, any order") {
    val rnd = new Random(7)
    val rows = Seq.tabulate(300)(i => ((i % 17).toLong, rnd.nextInt(10000) / 100.0))
    val oneShot = freshStore()
    IncrementalAgg.applyBatch(spark, oneShot, "agg", facts(rows), Seq("k"), measures)
    val expect = state(oneShot)
    for (trial <- 1 to 3) {
      val shuffled = rnd.shuffle(rows)
      val cuts = Seq(0, rnd.nextInt(300), rnd.nextInt(300), 300).sorted
      val store = freshStore()
      cuts.sliding(2).foreach { case Seq(a, b) =>
        // empty batches must be harmless
        IncrementalAgg.applyBatch(spark, store, "agg", facts(shuffled.slice(a, b)), Seq("k"), measures)
      }
      assert(state(store) == expect, s"trial $trial cuts $cuts")
    }
  }

  test("a batch with only new keys inserts; existing keys accumulate") {
    val store = freshStore()
    IncrementalAgg.applyBatch(spark, store, "agg", facts(Seq((1L, 1.0), (1L, 2.0))), Seq("k"), measures)
    IncrementalAgg.applyBatch(spark, store, "agg", facts(Seq((2L, 5.0))), Seq("k"), measures)
    IncrementalAgg.applyBatch(spark, store, "agg", facts(Seq((1L, 0.5), (2L, 0.5))), Seq("k"), measures)
    val got = state(store).map { case (k, (n, t)) => (k, n, t.toDouble) }.toSet
    assert(got == Set((1L, 3L, 3.5), (2L, 2L, 5.5)))
  }

  test("HLL sketch measure: incremental distinct estimate within 2% of exact") {
    val s = spark; import s.implicits._
    // 3 batches with heavy cross-batch overlap — exactly where naive
    // per-batch count-distinct summation would overcount badly
    val rnd = new Random(13)
    val rows = Seq.tabulate(3000)(i => ((i % 2).toLong, rnd.nextInt(400).toLong))
    val m = Seq(IncrementalAgg.Measure(
      "sk", hll_sketch_agg(col("v")), (t, u) => hll_union(t, u)))
    val store = freshStore()
    rows.grouped(1000).foreach { b =>
      IncrementalAgg.applyBatchM(spark, store, "agg", b.toDF("k", "v"), Seq("k"), m)
    }
    val est = store.read(spark, "agg")
      .select(col("k"), hll_sketch_estimate(col("sk")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("e").toDouble).toMap
    val exact = rows.toDF("k", "v").groupBy("k").agg(countDistinct("v").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, d) =>
      assert(math.abs(est(k) - d) <= 0.02 * d, s"key $k: est ${est(k)} vs exact $d")
    }
  }

  test("sketch cube rolls up: union of stored per-key HLL sketches answers the global question") {
    val s = spark; import s.implicits._
    val rnd = new Random(31)
    // heavy cross-key overlap: summing per-key distincts would overcount ~3x
    val rows = Seq.tabulate(3000)(i => ((i % 3).toLong, rnd.nextInt(500).toLong))
    val m = Seq(IncrementalAgg.Measure(
      "sk", hll_sketch_agg(col("v")), (t, u) => hll_union(t, u)))
    val store = freshStore()
    rows.grouped(1000).foreach { b =>
      IncrementalAgg.applyBatchM(spark, store, "agg", b.toDF("k", "v"), Seq("k"), m)
    }
    // the cube property: ANY rollup is a sketch union over stored state,
    // no raw-fact rescan
    val global = store.read(spark, "agg")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head.getAs[Long]("e").toDouble
    val exact = rows.map(_._2).distinct.size.toDouble
    assert(math.abs(global - exact) <= 0.02 * exact, s"global est $global vs exact $exact")
  }

  test("KLL sketch measure: incremental quantile estimate within rank bound of exact") {
    val s = spark; import s.implicits._
    graft.functions.Functions.register(s)
    val rnd = new Random(29)
    val rows = Seq.tabulate(4000)(i => ((i % 2).toLong, rnd.nextDouble() * 1000))
    val m = Seq(IncrementalAgg.Measure(
      "sk", org.apache.spark.sql.functions.call_function("kll_sketch", col("v")),
      (t, u) => org.apache.spark.sql.functions.call_function("kll_merge", t, u)))
    val store = freshStore()
    rows.grouped(1300).foreach { b =>
      IncrementalAgg.applyBatchM(spark, store, "agg", b.toDF("k", "v"), Seq("k"), m)
    }
    val est = store.read(spark, "agg")
      .select(col("k"),
        org.apache.spark.sql.functions.call_function("kll_quantile", col("sk"), lit(0.5)).as("med"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byKey = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    byKey.foreach { case (k, sorted) =>
      val rank = sorted.count(_ <= est(k)).toDouble / sorted.length
      assert(math.abs(rank - 0.5) <= 0.05, s"key $k: median est ${est(k)} has rank $rank")
    }
  }

  test("signed-delta retraction: D/U lower to +/- rows; a fully-cancelled key is a zero tombstone") {
    val s = spark; import s.implicits._
    val store = freshStore()
    val signed = Seq(
      "n" -> sum(col("w")),
      "total" -> sum(col("sv")))
    // base: k=1 has (10, 20); k=2 has (5)
    IncrementalAgg.applyBatch(spark, store, "agg",
      Seq((1L, 1L, 10L), (1L, 1L, 20L), (2L, 1L, 5L)).toDF("k", "w", "sv"),
      Seq("k"), signed)
    // CDC: update k=1's 10 -> 13 (retract+insert); delete BOTH of k=2's
    // rows' worth (full cancel)
    IncrementalAgg.applyBatch(spark, store, "agg",
      Seq((1L, -1L, -10L), (1L, 1L, 13L), (2L, -1L, -5L)).toDF("k", "w", "sv"),
      Seq("k"), signed)
    val st = store.read(spark, "agg").collect()
      .map(r => r.getAs[Long]("k") -> (r.getAs[Long]("n"), r.getAs[Long]("total"))).toMap
    assert(st(1L) == (2L, 33L))
    // the fold never deletes: the cancelled key stays as a ZERO
    // tombstone (reads filter n > 0; compaction drops it offline)
    assert(st(2L) == (0L, 0L))
  }

  test("null keys survive the null-safe merge join") {
    val s = spark; import s.implicits._
    val store = freshStore()
    val b1 = Seq[(Option[Long], Double)]((Some(1L), 1.0), (None, 2.0)).toDF("k", "v")
    val b2 = Seq[(Option[Long], Double)]((None, 3.0)).toDF("k", "v")
    IncrementalAgg.applyBatch(spark, store, "agg", b1, Seq("k"), measures)
    IncrementalAgg.applyBatch(spark, store, "agg", b2, Seq("k"), measures)
    val nullRow = store.read(spark, "agg").filter(col("k").isNull).collect()
    assert(nullRow.length == 1 && nullRow.head.getAs[Long]("n") == 2L)
  }
}
