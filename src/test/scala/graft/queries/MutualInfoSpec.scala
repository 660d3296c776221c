package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins `a39_mutual_info`: the quantized integer MI tracks the
  * straight double computation within quantization error, the cell
  * count is the contingency-table size, and independence sanity holds
  * (MI of a column with itself-derived marginals is ≥ 0 up to the
  * per-cell ±0.5µ rounding). */
class MutualInfoSpec extends SparkSpec {

  test("quantized MI == double MI within per-cell rounding (sf0.001)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val cells = Tables.events(s, dir)
      .select(col("event_type").as("et"), hour(col("ts")).cast("long").as("hr"))
      .groupBy("et", "hr").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = cells.map(_._3).sum
    val ca = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cb = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val miDouble = cells.map { case (a, b, c) =>
      c.toDouble / n * math.log(c.toDouble * n / (ca(a).toDouble * cb(b))) }.sum

    val row = AnalyticsQueries.all("a39_mutual_info")(s, dir).head()
    assert(row.getLong(0) == cells.length.toLong)
    assert(row.getLong(1) == n)
    val miQuant = row.getLong(2).toDouble / 1e6 / n
    // each of the |cells| terms contributes ≤ c·0.5µ quantization error
    assert(math.abs(miQuant - miDouble) <= 0.5e-6 * 1.01,
      s"quantized $miQuant vs double $miDouble")
  }
}
