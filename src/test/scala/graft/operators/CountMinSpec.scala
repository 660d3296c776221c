package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Count-min sketch as the heavy-hitters scale path: fixed-size
  * mergeable state regardless of key cardinality (the exact GROUP BY
  * form's state grows with distinct keys). CMS guarantees
  * estimate ≥ true count, and estimate ≤ true + eps·N with
  * probability ≥ confidence. */
class CountMinSpec extends SparkSpec {

  test("CMS estimates: overestimate-only, within eps*N of exact counts") {
    val s = spark; import s.implicits._
    val li = Tables.lineitem(s, "/root/testdata/sf0.001")
    val eps = 0.005
    val total = li.count()
    val cms = li.stat.countMinSketch("l_partkey", eps = eps, confidence = 0.99, seed = 42)
    val exact = li.groupBy($"l_partkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    var overshootFails = 0
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n, s"CMS must never underestimate: key $k est=$est true=$n")
      if (est > n + (eps * total).toLong) overshootFails += 1
    }
    // eps bound holds w.p. ≥ confidence per query; allow a small tail
    assert(overshootFails <= math.max(1, exact.length / 50),
      s"$overshootFails of ${exact.length} keys exceed the eps*N bound")
  }

  test("CMS sketches merge across partitions (distributed build)") {
    val s = spark; import s.implicits._
    val li = Tables.lineitem(s, "/root/testdata/sf0.001")
    // half/half build + merge must equal the single-pass sketch
    val a = li.filter($"l_orderkey" % 2 === 0)
      .stat.countMinSketch("l_partkey", eps = 0.01, confidence = 0.9, seed = 7)
    val b = li.filter($"l_orderkey" % 2 =!= 0)
      .stat.countMinSketch("l_partkey", eps = 0.01, confidence = 0.9, seed = 7)
    val whole = li.stat.countMinSketch("l_partkey", eps = 0.01, confidence = 0.9, seed = 7)
    val merged = a.mergeInPlace(b)
    val keys = li.select($"l_partkey").distinct().limit(50).as[Long].collect()
    keys.foreach { k =>
      assert(merged.estimateCount(k) == whole.estimateCount(k),
        s"merge must be lossless for key $k")
    }
  }
}
