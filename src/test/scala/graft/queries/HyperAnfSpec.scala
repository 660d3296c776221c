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
