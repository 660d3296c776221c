package graft.queries

import graft.SparkSpec

/** Gate for the KLL-cutpoint robust-outlier variant (no DuckDB oracle
  * by design — sketch internals differ across engines): the approx
  * query must agree with the exact median/MAD query on group counts
  * exactly, and on flag counts within the fence-jitter a <1%-rank-error
  * cutpoint can cause. */
class RobustOutliersApproxSpec extends SparkSpec {

  test("approx flags track exact flags per group within the KLL error budget") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = LifecycleQueries.all("a9_robust_outliers")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val approx = LifecycleQueries.all("a9_robust_outliers_approx")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(approx.keySet == exact.keySet, s"group set diverged at $dir")
      for ((g, (nExact, flagsExact)) <- exact) {
        val (nApprox, flagsApprox) = approx(g)
        assert(nApprox == nExact, s"group $g row count must be exact at $dir")
        // a cutpoint off by <1% rank moves the 3·1.4826·MAD fence by a
        // sliver; only points hugging the fence can flip
        val budget = math.max(5L, nExact / 100)
        assert(math.abs(flagsApprox - flagsExact) <= budget,
          s"group $g flags $flagsExact -> $flagsApprox exceeds budget $budget at $dir")
      }
    }
  }
}
