package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Generative properties for the MERGE upsert (SURVEY §5): pinned over
  * random batches, not just handpicked cases. */
class UpsertPropertySpec extends SparkSpec {

  private val rowGen: Gen[(Long, String, Double)] = for {
    k1 <- Gen.choose(0L, 20L)
    k2 <- Gen.oneOf("a", "b", "c", "d")
    v <- Gen.choose(-1000, 1000).map(_ / 10.0)
  } yield (k1, k2, v)

  private def batches(seed: Long, n: Int): Seq[Seq[(Long, String, Double)]] =
    (0 until n).map { i =>
      Gen.listOfN(15, rowGen).apply(Gen.Parameters.default, Seed(seed + i)).get
        .groupBy(r => (r._1, r._2)).values.map(_.head).toSeq // unique keys within a batch
    }

  private def df(rows: Seq[(Long, String, Double)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("ts", "key", "value")
  }

  private def toMap(d: DataFrame): Map[(Long, String), (Double, Long)] =
    d.collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap

  test("property: re-applying a batch only bumps counters of its keys") {
    for (seed <- 1L to 10L) {
      val Seq(b0, b1) = batches(seed, 2)
      val base = Upsert.merge(df(b0).withColumn("nupdates", org.apache.spark.sql.functions.lit(1L)),
        df(b1), Seq("ts", "key"))
      val again = Upsert.merge(base, df(b1), Seq("ts", "key"))
      val m1 = toMap(base); val m2 = toMap(again)
      assert(m1.keySet == m2.keySet)
      val b1Keys = b1.map(r => (r._1, r._2)).toSet
      m1.foreach { case (k, (v, n)) =>
        val (v2, n2) = m2(k)
        assert(v2 == v, s"value changed for $k (seed $seed)")
        assert(n2 == n + (if (b1Keys(k)) 1 else 0), s"counter wrong for $k (seed $seed)")
      }
    }
  }

  test("property: disjoint-key batches commute") {
    for (seed <- 1L to 10L) {
      val Seq(b0, raw1, raw2) = batches(seed, 3)
      // force disjoint key spaces by shifting ts
      val b1 = raw1.map { case (t, k, v) => (t + 100, k, v) }
      val b2 = raw2.map { case (t, k, v) => (t + 200, k, v) }
      val base = df(b0).withColumn("nupdates", org.apache.spark.sql.functions.lit(1L))
      val ab = Upsert.merge(Upsert.merge(base, df(b1), Seq("ts", "key")), df(b2), Seq("ts", "key"))
      val ba = Upsert.merge(Upsert.merge(base, df(b2), Seq("ts", "key")), df(b1), Seq("ts", "key"))
      assert(toMap(ab) == toMap(ba), s"not commutative (seed $seed)")
    }
  }

  test("property: merged table always contains the union of key sets") {
    for (seed <- 11L to 16L) {
      val Seq(b0, b1) = batches(seed, 2)
      val out = Upsert.merge(df(b0).withColumn("nupdates", org.apache.spark.sql.functions.lit(1L)),
        df(b1), Seq("ts", "key"))
      val keys = toMap(out).keySet
      assert(keys == (b0.map(r => (r._1, r._2)) ++ b1.map(r => (r._1, r._2))).toSet)
    }
  }
}
