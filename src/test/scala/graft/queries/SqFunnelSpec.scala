package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Functions
import graft.operators.TableStore
import graft.sources.Tables

/** Pins the `x2_sq_topk` funnel contract: the int8-code integer
  * shortlist CONTAINS the exact cosine top-10 at every testdata sf
  * (the property that lets the funnel share the brute-force oracle —
  * the x2_ann_topk / x2_ivf_topk discipline), the code table is
  * int8-ranged and build-once, and a warm probe reuses the committed
  * version. */
class SqFunnelSpec extends SparkSpec {

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

  private def shortlist50(dir: String): Set[Long] = {
    val s = spark
    val codes = VectorQueries.storedSqCodes(s, dir, Tables.embeddings(s, dir))
    val q = codes.filter(col("vec_id") === 0)
      .select(col("code").as("qcode"), col("csq").as("qsq"))
    codes.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .withColumn("intdot", expr(
        "aggregate(zip_with(code, qcode, (a, b) -> a * b), cast(0 as bigint), (acc, x) -> acc + x)"))
      .withColumn("approx", col("intdot") / sqrt((col("csq") * col("qsq")).cast("double")))
      .orderBy(col("approx").desc, col("vec_id")).limit(50)
      .collect().map(_.getLong(0)).toSet
  }

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"))
    test(s"int8 shortlist contains the exact top-10 at $sf") {
      val dir = s"/root/testdata/$sf"
      val top = exactTop10(dir)
      val cand = shortlist50(dir)
      assert(top.forall(cand.contains),
        s"missing from shortlist: ${top.filterNot(cand.contains)}")
    }

  test("codes are int8-ranged with exact csq; build-once warm reuse") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(s, dir)
    val codes = VectorQueries.storedSqCodes(s, dir, emb)
    // every code within [-127, 127]; csq equals the recomputed Σ code²
    val bad = codes.withColumn("mx", expr(
        "array_max(transform(code, x -> abs(x)))"))
      .withColumn("rsq", expr(
        "aggregate(code, cast(0 as bigint), (acc, x) -> acc + x * x)"))
      .filter(col("mx") > 127 || col("rsq") =!= col("csq"))
    assert(bad.count() == 0)
    assert(codes.count() == emb.count())
    // warm call resolves the SAME committed version (no rebuild)
    val store = new TableStore(
      s"/root/repo/target/tmp/sq-codes/v1/${Tables.fileKey(s, dir, "embeddings.parquet")}")
    val v1 = store.resolve(s, "sq_codes")
    VectorQueries.storedSqCodes(s, dir, emb)
    assert(store.resolve(s, "sq_codes") == v1)
  }

  test("funnel output equals the brute-force top-10 (the oracle contract)") {
    val s = spark
    val dir = "/root/testdata/sf0.01"
    val got = VectorQueries.all("x2_sq_topk")(s, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(got == exactTop10(dir))
  }
}
