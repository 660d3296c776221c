package graft.queries

import graft.SparkSpec

/** Pins `a15_bootstrap_ci`: 16 replicas, a deterministic seeded draw
  * (same output twice), the envelope actually brackets the observed
  * difference on this corpus, and the resample is non-degenerate
  * (lo < hi — the replicas genuinely vary). */
class BootstrapCiSpec extends SparkSpec {

  test("Poisson bootstrap envelope: deterministic, bracketing, non-degenerate (sf0.001)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    def run() = AnalyticsQueries.all("a15_bootstrap_ci")(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val a = run()
    assert(a == run(), "seeded resample must be deterministic")
    val (n, obs, lo, hi) = a.head
    assert(n == 16L)
    assert(lo < hi, "replicas must vary")
    assert(lo <= obs && obs <= hi,
      s"envelope [$lo, $hi] should bracket the observed diff $obs on this corpus")
  }
}
