package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.VectorQueries
import graft.sources.Tables

class QuantizeInt8Spec extends SparkSpec {

  test("expression equals the relational HOF baseline on real embeddings") {
    val s = spark; import s.implicits._
    Functions.register(s)
    val emb = Tables.embeddings(s, "/root/testdata/sf0.001")
    val both = emb.select(
      call_function("quantize_i8_stats", $"embedding").as("fast"),
      VectorQueries.quantStatsHof($"embedding").as("base"))
    val diff = both.filter(not($"fast" <=> $"base")).count()
    assert(diff == 0L, s"$diff vectors diverge from the HOF baseline")
  }

  test("edge cases: zero vector, saturation symmetry, null element, empty") {
    val s = spark; import s.implicits._
    Functions.register(s)
    val rows = Seq(
      (1L, Seq(0f, 0f, 0f)),                  // zero vector → zero stats
      (2L, Seq(1f, -1f)),                     // both saturate (|q|=127)
      (3L, Seq(2f, 1f, -2f))                  // mixed: q = 127, 64, -127
    ).toDF("id", "v")
      .select($"id", call_function("quantize_i8_stats", $"v").as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L) == Seq(3L, 0L, 0L))
    assert(rows(2L) == Seq(2L, 127L * 1 - 127L * 2, 2L))
    // q3: floor(2*127/2+.5)=127, floor(1*127/2+.5)=floor(64)=64, floor(-127+.5)=-127
    assert(rows(3L) == Seq(3L, 127L * 1 + 64L * 2 - 127L * 3, 2L))

    val nulls = Seq(Tuple1(Seq[java.lang.Float](1f, null))).toDF("v")
      .select(call_function("quantize_i8_stats", $"v")).collect()
    assert(nulls(0).isNullAt(0), "null element must yield null")
    val empty = Seq(Tuple1(Seq.empty[Float])).toDF("v")
      .select(call_function("quantize_i8_stats", $"v")).collect()
    assert(empty(0).isNullAt(0), "empty vector must yield null")
  }
}
