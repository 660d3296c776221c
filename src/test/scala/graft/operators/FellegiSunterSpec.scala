package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** EM fitting for Fellegi–Sunter linkage (Winkler '88 ECM) in exact
  * integer micro-probability arithmetic — determinism, separation on a
  * planted mixture, and classifier consistency with the fitted
  * parameters. The cross-engine (DuckDB) equivalence of
  * `emOracleCtes` is gated by the driver's `x1_fs_linkage_em` oracle
  * run; here we pin the Scala side's invariants.
  */
class FellegiSunterSpec extends AnyFunSuite {
  private val Micro = FellegiSunter.Micro

  /** Planted two-component mixture, 3 binary fields: 100 true-match
    * pairs agreeing on everything, 10_000 non-match pairs agreeing on
    * nothing, plus noise patterns. */
  private val planted: Map[Seq[Int], Long] = Map(
    Seq(1, 1, 1) -> 100L,
    Seq(1, 1, 0) -> 5L,
    Seq(0, 1, 0) -> 300L,
    Seq(1, 0, 0) -> 40L,
    Seq(0, 0, 1) -> 250L,
    Seq(0, 0, 0) -> 10000L)

  test("emFit is deterministic and iteration-order-free") {
    val a = FellegiSunter.emFit(planted, iters = 15)
    // re-insert in a different map order: same result
    val b = FellegiSunter.emFit(planted.toSeq.reverse.toMap, iters = 15)
    assert(a.p == b.p && a.m.sameElements(b.m) && a.u.sameElements(b.u))
  }

  test("emFit separates m from u on the planted mixture") {
    val ps = FellegiSunter.emFit(planted, iters = 15)
    // the match class is ~1% of pairs; p should land well under 10%
    assert(ps.p < Micro / 10, s"p=${ps.p}")
    // every field: agreement much likelier under match than non-match
    (0 until 3).foreach { i =>
      assert(ps.m(i) > ps.u(i) * 5, s"field $i: m=${ps.m(i)} u=${ps.u(i)}")
    }
    // all params clamped inside (0, 1) open interval in micros
    (ps.m ++ ps.u :+ ps.p).foreach { v =>
      assert(v >= BigInt(1) && v <= Micro - 1)
    }
  }

  test("classify: all-agree links, all-disagree nonlinks, under fitted params") {
    val ps = FellegiSunter.emFit(planted, iters = 15)
    assert(FellegiSunter.classify(ps, Seq(1, 1, 1)) == "link")
    assert(FellegiSunter.classify(ps, Seq(0, 0, 0)) == "nonlink")
  }

  test("classify is monotone: adding an agreement never demotes the decision") {
    val ps = FellegiSunter.emFit(planted, iters = 15)
    val rank = Map("nonlink" -> 0, "possible" -> 1, "link" -> 2)
    for {
      g <- Seq(Seq(0, 0, 0), Seq(0, 0, 1), Seq(0, 1, 0), Seq(1, 0, 0),
        Seq(0, 1, 1), Seq(1, 0, 1), Seq(1, 1, 0))
      i <- 0 until 3 if g(i) == 0
    } {
      val up = g.updated(i, 1)
      assert(rank(FellegiSunter.classify(ps, up)) >= rank(FellegiSunter.classify(ps, g)),
        s"$g -> $up demoted")
    }
  }

  test("emOracleCtes emits one CTE pair per round with exact floor division") {
    val sql = FellegiSunter.emOracleCtes(k = 3, iters = 15)
    assert(sql.contains("it0 AS") && sql.contains("it15 AS") && sql.contains("e15 AS"))
    assert(sql.contains("//"), "must use DuckDB exact integer floor division")
    assert(!sql.toLowerCase.contains("ln(") && !sql.toLowerCase.contains("exp("),
      "no transcendental functions — exact integer arithmetic only")
  }
}
