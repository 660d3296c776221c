package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins product quantization internals the oracle can't see:
  * determinism of the fit, and the ADC identity (a vector's own
  * lookup-table distance at its assigned codes IS its quantization
  * error — asymmetric distance is exact when the query is the stored
  * vector). */
class PqSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val emb = Tables.embeddings(spark, dir)
  private lazy val books = Pq.fit(emb, "vec_id", "embedding", iters = 2)

  test("fit is deterministic: two fits produce identical codebooks") {
    val again = Pq.fit(emb, "vec_id", "embedding", iters = 2)
    assert(books.map(_.map(_.toSeq).toSeq).toSeq == again.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("every (m, code) pair is in range and every vector gets M codes") {
    val rows = Pq.encode(emb, "vec_id", "embedding", books).collect()
    val n = emb.count()
    assert(rows.length == n * Pq.M)
    rows.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) < Pq.M)
      assert(r.getLong(2) >= 0L && r.getLong(2) < Pq.K)
    }
  }

  test("ADC identity: own-query LUT sum at assigned codes == encode q_err") {
    val scaled = emb.orderBy("vec_id").limit(5)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).map(x => Math.round(x * 1000000d) + 1000000L).toArray)
    val enc = Pq.encode(emb, "vec_id", "embedding", books)
      .filter(col("id") < 5).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    scaled.foreach { case (id, q) =>
      val lut = Pq.adcTable(q, books)
      val adc = (0 until Pq.M).map { m =>
        val (code, _) = enc((id, m)); lut(m)(code.toInt)
      }.sum
      val qErr = (0 until Pq.M).map(m => enc((id, m))._2).sum
      assert(adc == qErr, s"vec $id: adc $adc != q_err $qErr")
    }
  }
}
