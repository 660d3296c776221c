package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Functions, VecCentroid}
import graft.sources.Tables

class AnnSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("ANN top-10 equals brute-force top-10 (recall 1.0 on testdata)") {
    Functions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val brute = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))))
      .select(col("vec_id"), Functions.cosine(col("embedding"), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    val ann = Ann.annTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(ann == brute)
  }

  test("lsh_buckets expression equals the relational explode+groupBy bucket index") {
    Functions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val expr = asMap(Ann.bucketIndex(emb, "vec_id", "embedding"))
    val rel = asMap(Ann.bucketIndexRelational(emb, "vec_id", "embedding",
        Ann.hyperplanes(96, 6, 64))
      .select(col("id"), col("t"), col("b")))
    assert(expr == rel)
  }

  test("candidate set is a strict subset of the corpus (really approximate)") {
    Functions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val idx = Ann.bucketIndex(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding")
    val probe = Ann.bucketIndex(emb.filter(col("vec_id") === 0), "vec_id", "embedding")
      .select(col("t").as("pt"), col("b").as("pb"))
    val nCand = idx.join(broadcast(probe), col("t") === col("pt") && col("b") === col("pb"))
      .select("id").distinct().count()
    val n = emb.count() - 1
    assert(nCand < n, s"ANN degenerated to brute force: $nCand of $n")
    assert(nCand > 0)
  }

  test("persisted bucket index probe equals the ephemeral annTopK result") {
    Functions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val store = new TableStore(
      java.nio.file.Files.createTempDirectory("ann-spec").toString)
    Ann.buildIndex(emb, "vec_id", "embedding", store, "ann")
    val probeDf = Ann.probeTopK(emb, "vec_id", "embedding", store, "ann", 0L, 10)
    // the probe's bucket pre-filter reaches the index scan as a pushed
    // IN (row-group skipping over the sorted layout) and the exact
    // (t,b) match is a codegen'd broadcast hash join
    val plan = probeDf.queryExecution.executedPlan.toString
    assert(plan.contains("In(b") || plan.contains("In(B"), plan.take(1500))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    val probe = probeDf.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ephemeral = Ann.annTopK(emb, "vec_id", "embedding", 0L, 10, dim = Some(64))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe == ephemeral)
  }

  test("deriveBits: floor 6 on small corpora, +1 bit per doubling, capped") {
    assert(Ann.deriveBits(500) == 6)    // testdata sf0.01 — spec-pinned regime
    assert(Ann.deriveBits(2000) == 8)   // testdata sf0.1
    assert(Ann.deriveBits(1) == 6 && Ann.deriveBits(0) == 6)
    assert(Ann.deriveBits(1L << 40) == 28) // capped
    // monotone non-decreasing, never jumps by more than the doubling
    val bs = (1 to 24).map(i => Ann.deriveBits(1L << i))
    assert(bs == bs.sorted && bs.sliding(2).forall(p => p.last - p.head <= 1))
  }

  test("nearDupPairs (LSH-blocked, derived bits) equals the all-pairs top-20 on testdata") {
    Functions.register(spark)
    // sf0.1 matters most: n=2000 derives bits=8 (the other two derive
    // the old pinned 6), so this pins exactness AT the derived width.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, d)
      val e = emb.select(col("vec_id"), col("embedding"),
        sqrt(Functions.dotd(col("embedding"), col("embedding"))).as("nrm"))
      val a = e.select(col("vec_id").as("idA"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("idB"), col("embedding").as("eb"), col("nrm").as("nb"))
      val brute = a.join(b, col("idA") < col("idB"))
        .select(col("idA"), col("idB"),
          round(Functions.dotd(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("sim"))
        .orderBy(col("sim").desc, col("idA"), col("idB")).limit(20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val blocked = Ann.nearDupPairs(emb, "vec_id", "embedding", k = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(blocked == brute, s"blocked != all-pairs at $d")
    }
  }

  test("candidate-slot volume grows ~linearly with corpus size (derived bits)") {
    Functions.register(spark)
    def slots(d: String): (Long, Long) = {
      val emb = Tables.embeddings(spark, d)
      val n = emb.count()
      val idx = Ann.bucketIndex(emb, "vec_id", "embedding",
        tables = Ann.deriveTables(n), bits = Ann.deriveBits(n))
      val lhs = idx.select(col("id").as("idA"), col("t"), col("b"))
      val rhs = idx.select(col("id").as("idB"), col("t").as("tB"), col("b").as("bB"))
      (n, lhs.join(rhs,
        col("t") === col("tB") && col("b") === col("bB") && col("idA") < col("idB")).count())
    }
    val (n1, c1) = slots("/root/testdata/sf0.01")
    val (n2, c2) = slots("/root/testdata/sf0.1")
    // fixed bits=6 would scale slots by (n2/n1)² = 16×; derived bits
    // must keep growth ~linear in n (2× headroom over proportional
    // for non-uniform bucket occupancy)
    assert(c2.toDouble / c1 <= 2.0 * n2.toDouble / n1,
      s"candidate slots grew super-linearly: n $n1->$n2, slots $c1->$c2")
  }

  test("VecCentroid aggregator matches the exact decimal centroid within 1e-5") {
    val emb = Tables.embeddings(spark, dir)
    val agg = emb.groupBy(col("label"))
      .agg(VecCentroid.udaf(col("embedding")).as("c"))
      .select(col("label"), posexplode(col("c")).as(Seq("idx", "v")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val exact = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("idx", "v")))
      .groupBy("label", "idx")
      .agg(Functions.davg(col("v").cast("double")).as("v"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(agg.keySet == exact.keySet)
    // 1e-5: the exact path truncates each element at decimal scale 6
    agg.foreach { case (k, v) => assert(math.abs(v - exact(k)) < 1e-5, s"drift at $k") }
  }

  test("VecCentroid handles empty group shape: zero buffer merges are identity") {
    val s = spark; import s.implicits._
    val df = Seq((1, Seq(1.0f, 3.0f)), (1, Seq(3.0f, 5.0f)), (2, Seq(2.0f, 2.0f)))
      .toDF("label", "v").repartition(4)
    val got = df.groupBy("label").agg(VecCentroid.udaf(col("v")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got(1) == Seq(2.0, 4.0) && got(2) == Seq(2.0, 2.0))
  }
}
