package graft.queries

import graft.SparkSpec

/** Pins `a18_dp_counts`: the quantized inverse-CDF Laplace mechanism
  * is deterministic given the seeded draw, bounded by the CDF's
  * support (|noise| ≤ ln(10⁶)·10⁶ µ at the clamped tail), internally
  * consistent, and actually perturbs (non-zero noise exists). */
class DpCountsSpec extends SparkSpec {

  test("seeded Laplace release: deterministic, bounded, consistent (sf0.001)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    def run() = AnalyticsQueries.all("a18_dp_counts")(s, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val a = run()
    assert(a == run(), "seeded mechanism must be deterministic")
    assert(a.nonEmpty)
    a.foreach { case (et, n, noise6, noisy6) =>
      assert(noisy6 == n * 1000000L + noise6, s"$et: release inconsistent")
      // |noise| ≤ -ln(1/1e6) = 6·ln(10) ≈ 13.8157, in µ-units
      assert(math.abs(noise6) <= 13815511L, s"$et: |noise| beyond the clamped tail")
    }
    assert(a.exists(_._3 != 0L), "no group drew non-zero noise — mechanism inert")
    // both signs should appear across the group keys' hash draws
    assert(a.map(_._3).exists(_ > 0L) || a.size < 3,
      "all draws negative — suspicious for a symmetric CDF")
  }
}
