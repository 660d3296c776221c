package graft.queries

import graft.SparkSpec

/** Gate for the KLL-cutpoint winsorize variant (no DuckDB oracle by
  * design): group/row counts must be exact, and the clamped mean may
  * drift only as far as a <1%-rank-error cutpoint can move it. */
class WinsorizeApproxSpec extends SparkSpec {

  test("approx winsorized mean tracks exact per group within the KLL error budget") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      def collect(name: String) =
        AnalyticsQueries.all(name)(spark, dir).collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toMap
      val exact = collect("a10_winsorize")
      val approx = collect("a10_winsorize_approx")
      assert(approx.keySet == exact.keySet)
      for ((g, (wsum, lo, hi, n)) <- exact) {
        val (aw, alo, ahi, an) = approx(g)
        assert(an == n, s"group $g row count must be exact at $dir")
        // clip counts sit at the 5%/95% rank fences: a <1% rank error
        // can re-classify at most ~1.5% of rows per tail
        val clipBudget = math.max(5L, n * 15 / 1000)
        assert(math.abs(alo - lo) <= clipBudget && math.abs(ahi - hi) <= clipBudget,
          s"group $g clips ($lo,$hi) -> ($alo,$ahi) beyond budget $clipBudget at $dir")
        // the winsorized MEAN moves by at most the fence shift: bound
        // the relative drift at 1%
        val mExact = wsum.toDouble / n
        val mApprox = aw.toDouble / an
        assert(math.abs(mApprox - mExact) <= 0.01 * math.abs(mExact),
          s"group $g winsorized mean $mExact -> $mApprox drifts >1% at $dir")
      }
    }
  }
}
