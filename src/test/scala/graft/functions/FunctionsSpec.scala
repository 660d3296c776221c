package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Functions._

class FunctionsSpec extends SparkSpec {

  test("dotd / l2norm / cosine over array<float>") {
    val s = spark; import s.implicits._
    Functions.register(s)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(2.0f, 0.0f), Array(4.0f, 0.0f))
    ).toDF("a", "b")
    val rows = df.select(
      dotd($"a", $"b").as("dot"),
      round(cosine($"a", $"b"), 9).as("cos")).collect()
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).getDouble(0) == 0.0 && rows(1).getDouble(1) == 0.0)
    assert(rows(2).getDouble(1) == 1.0)
  }

  test("tokenCount: blank=0, single=1, collapses runs of whitespace") {
    val s = spark; import s.implicits._
    val got = Seq("", "   ", "one", " a  b\tc ", "a\nb")
      .toDF("t").select(tokenCount($"t")).as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 1L, 3L, 2L))
  }

  test("approx_count_distinct within 3% of exact (rsd=0.01) on testdata") {
    val s = spark; import s.implicits._
    val li = graft.sources.Tables.lineitem(s, "/root/testdata/sf0.001")
    val exact = li.select(countDistinct($"l_orderkey")).as[Long].head
    val approx = li.select(approx_count_distinct($"l_orderkey", 0.01)).as[Long].head
    assert(math.abs(approx - exact).toDouble / exact < 0.03, s"$approx vs $exact")
  }

  test("approx_percentile within 1% of exact percentile per group") {
    val s = spark; import s.implicits._
    val li = graft.sources.Tables.lineitem(s, "/root/testdata/sf0.001")
    val both = li.groupBy($"l_returnflag").agg(
      expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("ex"),
      expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)").as("ap"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val ex = r.getSeq[Double](1); val ap = r.getSeq[Double](2)
      ex.zip(ap).foreach { case (e, a) =>
        assert(math.abs(a - e) / e < 0.01, s"flag=${r.get(0)}: approx $a vs exact $e")
      }
    }
  }

  test("dsum is exact and partition-order independent") {
    val s = spark; import s.implicits._
    val xs = (1 to 10000).map(i => (i % 7).toDouble + 0.01)
    val a = xs.toDF("x").repartition(1).agg(dsum($"x")).head.getDouble(0)
    val b = xs.toDF("x").repartition(32).agg(dsum($"x")).head.getDouble(0)
    assert(a == b)
    assert(a == xs.map(BigDecimal(_)).sum.toDouble)
  }
}
