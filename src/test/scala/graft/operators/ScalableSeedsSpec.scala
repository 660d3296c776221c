package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.functions.Functions
import graft.sources.Tables

/** kmeans‖ oversampled seeding (Ivf.scalableSeeds / buildIndexScalable
  * — Bahmani VLDB'12): deterministic content-hash draws, bounded
  * candidate collects, and seed QUALITY bound-gated against the exact
  * Gonzalez farthest-first 2-approximation at every sf (the
  * DOULION/HyperANF gating discipline: an approximate path ships with
  * a measured bound against the exact one, pinned per sf). Also pins
  * the property that lets `x2_ivf_scalable_topk` share the
  * brute-force oracle: the scalable-seeded index's nprobe=12 probe
  * shortlist contains the exact top-10 at every sf. */
class ScalableSeedsSpec extends SparkSpec {

  private val K = 8

  private def scaled(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), Kmeans.scaledVec(col("embedding")).as("x6"))

  private def d2To(c: Seq[Long]) = aggregate(
    zip_with(col("x6"), typedLit(c), (a, b) => (a - b) * (a - b)),
    lit(0L), (acc, v) => acc + v)

  /** max over the corpus of min d2 to the seed set (coverage radius²). */
  private def radius(x: DataFrame, seeds: Seq[Seq[Long]]): Long =
    x.select(least(seeds.map(d2To): _*).as("m"))
      .agg(max(col("m"))).head().getLong(0)

  /** Gonzalez farthest-first (the exact 2-approx baseline), k picks. */
  private def gonzalez(x: DataFrame, k: Int): Seq[Seq[Long]] = {
    val first = x.orderBy("vec_id").limit(1).head().getSeq[Long](1)
    var picks = Vector(first)
    var m = x.select(col("vec_id"), col("x6"), d2To(first).as("m")).localCheckpoint()
    for (_ <- 2 to k) {
      val p = m.orderBy(col("m").desc, col("vec_id")).limit(1).head().getSeq[Long](1)
      picks = picks :+ p
      m = m.select(col("vec_id"), col("x6"), least(col("m"), d2To(p)).as("m"))
        .localCheckpoint()
    }
    picks
  }

  test("deterministic: two runs pick identical seeds (sf0.001)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def run() = Ivf.scalableSeeds(emb, "vec_id", "embedding", K)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val a = run()
    val b = run()
    assert(a == b)
    assert(a.length == K)
    assert(a.map(_._2).distinct.length == K) // k distinct centers
  }

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"))
    test(s"seed coverage radius within 2x of the exact Gonzalez 2-approx at $sf") {
      val emb = Tables.embeddings(spark, s"/root/testdata/$sf")
      val x = scaled(emb).localCheckpoint()
      val seeds = Ivf.scalableSeeds(emb, "vec_id", "embedding", K)
        .collect().map(r => r.getSeq[Double](1))
        // seeds are corpus vectors, so re-quantizing them reproduces
        // their exact x6 coordinates
        .map(v => v.map(d => math.round(d * 1000000d) + 1000000L))
        .toSeq
      val rScal = radius(x, seeds)
      val rGonz = radius(x, gonzalez(x, K))
      info(s"$sf radius^2 ratio = ${rScal.toDouble / rGonz} ($rScal vs $rGonz)")
      // measured radius^2 ratios: 1.07 / 1.11 / 1.03 across the three
      // sfs — the oversampled seeds essentially match the exact
      // farthest-first baseline; 2x radius^2 (= sqrt(2)x radius) is
      // the pinned envelope with margin. Gonzalez itself is a
      // 2-approx of OPT, so this bounds 2*sqrt(2)x OPT.
      assert(rScal <= 2L * rGonz,
        s"$sf: scalable radius^2 $rScal vs gonzalez $rGonz (ratio ${rScal.toDouble / rGonz})")
    }

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"))
    test(s"scalable-seeded index: nprobe=12 probe shortlist contains the exact top-10 at $sf") {
      val s = spark
      Functions.register(s)
      val dir = s"/root/testdata/$sf"
      val emb = Tables.embeddings(s, dir)
      val store = new TableStore(
        s"/root/repo/target/tmp/ivf-scal/v2/${Tables.fileKey(s, dir, "embeddings.parquet")}")
      if (!store.exists(s, "ivf_centroids") || !store.exists(s, "ivf_postings"))
        Ivf.buildIndexScalable(emb, "vec_id", "embedding", store, "ivf", iters = 6)
      val posted = store.read(s, "ivf_postings").select("id")
      assert(posted.count() == emb.count())
      assert(posted.distinct().count() == emb.count())
      val qv = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
      val cand = Ivf.probeTopK(s, store, "ivf",
          emb.filter(col("vec_id") === 0L).select("embedding"), 0L, 50, 12)
        .collect().map(_.getLong(0)).toSet
      val top = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"), Functions.cosine(col("embedding"), col("qv")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSeq
      assert(top.forall(cand.contains),
        s"missing from scalable-index shortlist: ${top.filterNot(cand.contains)}")
    }
}
