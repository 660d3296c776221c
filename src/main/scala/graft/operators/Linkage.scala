package graft.operators

/** Fellegi–Sunter (JASA'69) probabilistic record linkage: EM parameter
  * fitting (Winkler '88 ECM) over binary comparison vectors, in EXACT
  * integer micro-probability arithmetic.
  *
  * Why integers: the fitted parameters are part of an oracle-gated query
  * result, so the DuckDB oracle unrolls the IDENTICAL fixed number of EM
  * rounds over the same pattern-count table and must land on
  * bit-identical values. Every probability is a BigInt in millionths
  * ("micros", 1e6 = 1.0); the E-step responsibility is the exact floor
  * division γ = ⌊p·mm·10⁶ / (p·mm + (10⁶−p)·uu)⌋ and the M-step is exact
  * floor division of exact integer sums — no floating point anywhere, so
  * there is nothing for two engines to disagree on. Magnitudes: products
  * of four micro-probabilities ≤ 10²⁴, ×10⁶ ≤ 10³⁰ — inside BigInt here
  * and HUGEINT (<1.7e38) on the DuckDB side.
  *
  * The sufficient statistics of conditionally-independent binary-field
  * EM are just the 2^k pattern counts (k = #fields), so the distributed
  * part of a fit is ONE aggregate; the iteration itself touches ≤2^k
  * rows. That is what makes this operator 100 TB-shaped: the corpus-size
  * work is a single groupBy over blocked candidates, and the driver-side
  * loop is O(2^k · iters) regardless of data volume.
  */
object FellegiSunter {
  val Micro: BigInt = BigInt(1000000)

  /** One fitted parameter set, all in micros. */
  final case class Params(p: BigInt, m: Array[BigInt], u: Array[BigInt])

  private def clamp(x: BigInt): BigInt =
    x.max(BigInt(1)).min(Micro - 1)

  /** Fit (p, m_i, u_i) by `iters` exact-integer EM rounds over pattern
    * counts. `counts` maps a binary comparison vector (length k) to its
    * candidate-pair count. Init: p=0.1, m_i=0.9, u_i=0.1 (the standard
    * uninformative-but-separated start; Winkler '88 §4). Deterministic:
    * same counts + same iters ⇒ same params, in any iteration order
    * (sums are over an explicitly sorted pattern list).
    */
  def emFit(counts: Map[Seq[Int], Long], iters: Int): Params = {
    val k = counts.head._1.size
    require(counts.keys.forall(_.size == k), "ragged comparison vectors")
    val pats = counts.toSeq.sortBy(_._1.mkString) // deterministic order
    var p = BigInt(100000)
    var m = Array.fill(k)(BigInt(900000))
    var u = Array.fill(k)(BigInt(100000))
    for (_ <- 1 to iters) {
      // E-step: responsibility per pattern, exact floor division.
      val gam = pats.map { case (g, n) =>
        val mm = (0 until k).map(i => if (g(i) == 1) m(i) else Micro - m(i)).product
        val uu = (0 until k).map(i => if (g(i) == 1) u(i) else Micro - u(i)).product
        val w = p * mm
        val v = (Micro - p) * uu
        (g, BigInt(n), (w * Micro) / (w + v)) // w+v ≥ 1: params clamped to [1, 1e6-1]
      }
      // M-step: exact integer sums, floor division, clamp.
      val s = gam.map { case (_, n, g) => g * n }.sum
      val d = gam.map { case (_, n, g) => (Micro - g) * n }.sum
      val nTot = gam.map(_._2).sum
      p = clamp(s / nTot)
      m = Array.tabulate(k) { i =>
        val num = gam.collect { case (g, n, ga) if g(i) == 1 => ga * n }.sum
        clamp(num * Micro / s.max(BigInt(1)))
      }
      u = Array.tabulate(k) { i =>
        val num = gam.collect { case (g, n, ga) if g(i) == 1 => (Micro - ga) * n }.sum
        clamp(num * Micro / d.max(BigInt(1)))
      }
    }
    Params(p, m, u)
  }

  /** Classify a comparison vector under fitted params by the EXACT
    * integer likelihood-ratio test. The classic milli-bit thresholds
    * (link at ≥ 9000 ≈ 9 bits of evidence, nonlink below 0 bits) become
    * mm ≥ 2⁹·uu and mm < uu — the same classifier with no logarithms,
    * so no transcendental function for two engines to disagree on.
    */
  def classify(ps: Params, g: Seq[Int]): String = {
    val k = g.size
    val mm = (0 until k).map(i => if (g(i) == 1) ps.m(i) else Micro - ps.m(i)).product
    val uu = (0 until k).map(i => if (g(i) == 1) ps.u(i) else Micro - ps.u(i)).product
    if (mm >= uu * 512) "link"
    else if (mm < uu) "nonlink"
    else "possible"
  }

  /** The DuckDB-side EM unroll: chained CTE text computing the identical
    * `iters` rounds over a pattern-count CTE named `pat` with columns
    * (g1..gk HUGEINT, n HUGEINT). Emits CTEs `it0..it{iters}` (params in
    * micros as HUGEINT) using exact `//` floor division — textually
    * different from the Scala above but arithmetically identical, which
    * is the point of the gate. Returned string is the CTE list fragment
    * to splice after `pat` (starts with a comma).
    */
  def emOracleCtes(k: Int, iters: Int): String = {
    def mprod(src: String, pref: String): String =
      (1 to k).map(i => s"(CASE WHEN g$i = 1 THEN $src.$pref$i ELSE 1000000 - $src.$pref$i END)")
        .mkString(" * ")
    val it0 = s"it0 AS (SELECT CAST(100000 AS HUGEINT) AS p, " +
      (1 to k).map(i => s"CAST(900000 AS HUGEINT) AS m$i").mkString(", ") + ", " +
      (1 to k).map(i => s"CAST(100000 AS HUGEINT) AS u$i").mkString(", ") + ")"
    val rounds = (1 to iters).map { t =>
      val prev = s"it${t - 1}"
      val e =
        s"""e$t AS (SELECT ${(1 to k).map(i => s"pat.g$i").mkString(", ")}, pat.n,
           |  ((i.p * ${mprod("i", "m")}) * 1000000)
           |  // (i.p * ${mprod("i", "m")} + (1000000 - i.p) * ${mprod("i", "u")}) AS gam
           |  FROM pat, $prev i)""".stripMargin
      val ms = (1 to k).map(i =>
        s"LEAST(999999, GREATEST(1, (SUM(CASE WHEN g$i = 1 THEN gam * n ELSE 0 END) * 1000000) // GREATEST(1, SUM(gam * n)))) AS m$i")
      val us = (1 to k).map(i =>
        s"LEAST(999999, GREATEST(1, (SUM(CASE WHEN g$i = 1 THEN (1000000 - gam) * n ELSE 0 END) * 1000000) // GREATEST(1, SUM((1000000 - gam) * n)))) AS u$i")
      val it =
        s"""it$t AS (SELECT
           |  LEAST(999999, GREATEST(1, SUM(gam * n) // SUM(n))) AS p,
           |  ${(ms ++ us).mkString(",\n  ")}
           |  FROM e$t)""".stripMargin
      s"$e,\n$it"
    }
    (it0 +: rounds).mkString(",\n", ",\n", "")
  }
}
