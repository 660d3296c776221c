package graft.functions

import graft.SparkSpec
import graft.queries.CoreQueries

import scala.util.Random

class TopKSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("reduce/merge match sort-and-take on random streams, any split point") {
    val agg = new TopK(3)
    val rnd = new Random(42)
    for (_ <- 1 to 50) {
      val n = rnd.nextInt(20)
      // coarse values force ties; tiebreak must be ascending key
      val xs = Vector.fill(n)((rnd.nextInt(5).toDouble, rnd.nextInt(100).toLong))
      val expect = xs.sortBy { case (v, k) => (-v, k) }.take(3)
      val folded = xs.foldLeft(agg.zero)(agg.reduce)
      assert(folded == expect, s"reduce on $xs")
      val cut = if (n == 0) 0 else rnd.nextInt(n + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(merged == expect, s"merge at $cut on $xs")
    }
  }

  test("NaN ranks largest (total order, matching Spark's window sort)") {
    val agg = new TopK(2)
    val xs = Vector((Double.NaN, 9L), (5.0, 1L), (3.0, 2L))
    val folded = xs.foldLeft(agg.zero)(agg.reduce)
    assert(folded.map(_._2) == Vector(9L, 1L) && folded.head._1.isNaN, folded)
    // split-independence with NaN present
    val merged = agg.merge(
      xs.take(1).foldLeft(agg.zero)(agg.reduce),
      xs.drop(1).foldLeft(agg.zero)(agg.reduce))
    assert(merged.map(_._2) == folded.map(_._2))
  }

  test("buffer never exceeds k") {
    val agg = new TopK(2)
    val buf = (1 to 100).foldLeft(agg.zero)((b, i) => agg.reduce(b, (i.toDouble, i.toLong)))
    assert(buf.length == 2 && buf.head._1 == 100.0)
  }

  test("w1_topk_agg answers exactly like the window-rank form") {
    val viaAgg = CoreQueries.all("w1_topk_agg")(spark, dir).collect().toSeq
    val viaWindow = CoreQueries.all("w1_top_orders_per_cust")(spark, dir).collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("plan is partial+final object-hash aggregate, no Window, no partition sort") {
    val df = CoreQueries.all("w1_topk_agg")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p.take(1200))
    assert(p.contains("partial_topk") || p.contains("partial_TopK"), p.take(1200))
    assert(!p.contains("Window"), p.take(1200))
  }

  test("TopKPay: payload rides along; ranking identical to TopK at any split") {
    val pay = new TopKPay(3)
    val plain = new TopK(3)
    val rnd = new Random(7)
    for (_ <- 1 to 50) {
      val n = rnd.nextInt(20)
      // distinct tiebreak keys: a duplicated (value, key) would make
      // the payload-ownership check below ambiguous
      val xs = rnd.shuffle(Vector.tabulate(n)(i =>
        (rnd.nextInt(5).toDouble, i.toLong, rnd.nextDouble())))
      val cut = if (n == 0) 0 else rnd.nextInt(n + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = pay.merge(
        a.foldLeft(pay.zero)(pay.reduce),
        b.foldLeft(pay.zero)(pay.reduce))
      // same (value, tiebreak) ranking as the payload-free form
      val ref = xs.map(t => (t._1, t._2))
        .splitAt(cut) match { case (l, r) =>
          plain.merge(l.foldLeft(plain.zero)(plain.reduce), r.foldLeft(plain.zero)(plain.reduce)) }
      assert(merged.map(t => (t._1, t._2)) == ref, s"ranking diverged on $xs at $cut")
      // each kept entry carries ITS OWN payload, not a neighbor's
      val byKey = xs.map(t => (t._1, t._2) -> t._3).toMap
      merged.foreach(t => assert(t._3 == byKey((t._1, t._2)), s"payload mixed up on $xs"))
    }
  }
}
