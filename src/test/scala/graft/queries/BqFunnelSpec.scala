package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Functions
import graft.sources.Tables

/** Pins the `x2_bq_topk` funnel contract: the 1-bit sign-code
  * ASYMMETRIC integer shortlist CONTAINS the exact cosine top-10 at
  * every testdata sf (the property that lets the funnel share the
  * brute-force oracle — the x2_sq_topk discipline), the packed code
  * reproduces per-dim signs bit for bit (including dim 63 on the
  * BIGINT sign bit), and the code table is build-once. */
class BqFunnelSpec extends SparkSpec {

  private def exactTop10(dir: String): Seq[Long] = {
    val s = spark
    Functions.register(s)
    val emb = Tables.embeddings(s, dir)
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))))
      .select(col("vec_id"), round(Functions.cosine(col("embedding"), col("qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
  }

  private def shortlist256(dir: String): Set[Long] = {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    val codes = VectorQueries.storedBqCodes(s, dir, emb)
    val q6 = emb.filter(col("vec_id") === 0L)
      .select(expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))").as("q6"))
    codes.filter(col("vec_id") =!= 0L).crossJoin(broadcast(q6))
      .withColumn("iscore", expr(
        "aggregate(zip_with(q6, sequence(0, 63), (x, i) -> " +
          "IF(getbit(code, i) = 1, x, -x)), cast(0 as bigint), (acc, e) -> acc + e)"))
      .orderBy(col("iscore").desc, col("vec_id")).limit(256)
      .collect().map(_.getLong(0)).toSet
  }

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"))
    test(s"asymmetric 1-bit shortlist contains the exact top-10 at $sf") {
      val dir = s"/root/testdata/$sf"
      val top = exactTop10(dir)
      val cand = shortlist256(dir)
      assert(top.forall(cand.contains),
        s"missing from shortlist: ${top.filterNot(cand.contains)}")
    }

  test("packed code reproduces per-dim signs, including the sign bit (dim 63)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(s, dir)
    val codes = VectorQueries.storedBqCodes(s, dir, emb)
    val bad = emb.join(codes, "vec_id")
      .withColumn("mismatch", expr(
        "size(filter(zip_with(embedding, sequence(0, 63), (x, i) -> " +
          "IF(cast(x as double) > 0d, 1, 0) <> getbit(code, i)), b -> b))"))
      .agg(sum("mismatch")).head.getLong(0)
    assert(bad == 0L, s"$bad sign bits disagree with the raw embeddings")
    // some corpus vector must exercise bit 63 (a negative packed code),
    // or the sign-bit claim above is vacuous
    val negCodes = codes.filter(col("code") < 0L).count()
    assert(negCodes > 0L, "no vector set bit 63 — sign-bit path untested")
  }

  test("code table is build-once: a second call reads the committed version") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(s, dir)
    val first = VectorQueries.storedBqCodes(s, dir, emb)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val second = VectorQueries.storedBqCodes(s, dir, emb)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(first == second)
  }
}
