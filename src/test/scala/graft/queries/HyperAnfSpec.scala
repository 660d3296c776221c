package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Graph

/** Bound gate for the HyperANF-sketched all-sources harmonic
  * centrality (Graph.hyperAnfHarmonic) — the DOULION-vs-exact
  * discipline: the sketched estimator is pinned against exact
  * hand-computed values on fixtures (where DataSketches HLL runs in
  * exact coupon mode) and against the exact 4-pivot multi-source BFS
  * on the testdata co-purchase graph at two scale factors. */
class HyperAnfSpec extends SparkSpec {

  private def edgesOf(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  test("path graph: exact harmonic in ppm (balls in coupon mode are exact)") {
    // 0-1-2-3-4: harm(0) = 1 + 1/2 + 1/3 + 1/4, harm(2) = 2 + 2/2
    val got = Graph.hyperAnfHarmonic(edgesOf((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == (5L, 1000000L + 500000L + 333333L + 250000L))
    assert(got(2L) == (5L, 2000000L + 1000000L))
    assert(got(4L) == got(0L))
  }

  test("disconnected components: unreached nodes contribute zero") {
    // star 0-{1,2,3} plus isolated pair 10-11
    val got = Graph.hyperAnfHarmonic(
        edgesOf((0L, 1L), (0L, 2L), (0L, 3L), (10L, 11L)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == (4L, 3000000L))                    // three at distance 1
    assert(got(1L) == (4L, 1000000L + 2 * 500000L))      // hub at 1, leaves at 2
    assert(got(10L) == (2L, 1000000L))                   // its component only
  }

  test("reach profile: exact neighborhood function on the path fixture") {
    val prof = Graph.hyperAnfReachProfile(
        edgesOf((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // N(t) over 0-1-2-3-4: 5, 13, 19, 23, 25 (hand-computed; balls in
    // coupon mode are exact)
    assert(prof == Map(0L -> 5L, 1L -> 13L, 2L -> 19L, 3L -> 23L, 4L -> 25L))
  }

  test("reach profile matches exact ALL-sources BFS within 5% at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val pairs = AnalyticsQueries.copurchaseStore(spark, dir).read(spark, "pairs")
      .filter(col("pair_n") >= 2).select(col("part_a").as("a"), col("part_b").as("b"))
    // exact N(t): every node a source — feasible at this sf (the
    // (src, node) frame is |V|² bounded)
    val lvls = Graph.bfsLevelsMulti(pairs, nSources = Int.MaxValue)
      .groupBy(col("lvl")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxT = lvls.keys.max
    val exactN = (0L to maxT).map(t => t -> (0L to t).map(lvls.getOrElse(_, 0L)).sum).toMap
    val prof = Graph.hyperAnfReachProfile(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prof.keys.max == maxT, s"round count ${prof.keys.max} vs exact diameter $maxT")
    exactN.foreach { case (t, n) =>
      assert(math.abs(prof(t) - n) * 20 <= n, s"t=$t: ${prof(t)} vs exact $n")
    }
  }

  test("co-purchase graph: sketched estimates match the exact 4-pivot BFS per sf") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val pairs = AnalyticsQueries.copurchaseStore(spark, dir).read(spark, "pairs")
        .filter(col("pair_n") >= 2).select(col("part_a").as("a"), col("part_b").as("b"))
      val exact = Graph.bfsLevelsMulti(pairs, nSources = 4)
        .filter(col("lvl") >= 1)
        .groupBy(col("src"))
        .agg(sum(expr("1000000 div lvl")).as("harmonic_num"),
          count(lit(1)).as("n_reached"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val est = Graph.hyperAnfHarmonic(pairs)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(1))).toMap
      exact.foreach { case (src, (exHarm, exReached)) =>
        val (gotHarm, gotReached) = est(src)
        // reached_est counts the node itself; exact n_reached does not
        assert(math.abs(gotReached - (exReached + 1)) * 20 <= exReached + 1,
          s"$dir src=$src reached $gotReached vs ${exReached + 1}")
        assert(math.abs(gotHarm - exHarm) * 20 <= exHarm,
          s"$dir src=$src harmonic $gotHarm vs $exHarm (>5% off)")
      }
    }
  }
}
