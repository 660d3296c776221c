package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Functions
import graft.sources.Tables

class IvfSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("IVF top-10 recall vs brute force; postings partition the corpus") {
    Functions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val brute = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))))
      .select(col("vec_id"), Functions.cosine(col("embedding"), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    val ivf = Ivf.ivfTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    // deterministic pipeline => exact recall pin. 8/10 at nprobe=8/16 is
    // the honest ceiling for the EPHEMERAL index (trained without the
    // query vector) on these near-uniform embeddings.
    assert((ivf.toSet & brute.toSet).size == 8, s"recall changed: $ivf")

    val centroids = Ivf.trainCentroids(emb, "vec_id", "embedding", 16)
    val postings = Ivf.assign(emb, "vec_id", "embedding", centroids)
    assert(postings.count() == emb.count())        // every vector assigned
    assert(postings.select("id").distinct().count() == emb.count()) // exactly once
  }

  test("persisted index probe: recall 10/10, postings carry vectors, probe reads a cluster subset") {
    Functions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val store = new TableStore(
      java.nio.file.Files.createTempDirectory("ivf-spec").toString)
    Ivf.buildIndex(emb, "vec_id", "embedding", store, "ivf")
    val postings = store.read(spark, "ivf_postings")
    assert(postings.count() == emb.count())
    assert(postings.columns.toSet == Set("id", "cid", "v"))
    val brute = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))))
      .select(col("vec_id"), Functions.cosine(col("embedding"), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val probeDf = Ivf.probeTopK(spark, store, "ivf",
        emb.filter(col("vec_id") === 0L).select("embedding"), 0L, 10, nprobe = 8)
    // the probe scan is partition-pruned to the probed clusters
    val plan = probeDf.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"), plan.take(800))
    val probe = probeDf.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // full-corpus index + nprobe=8/16 ⇒ exact top-10, the basis for
    // x2_ivf_topk sharing the brute-force oracle (checked at every sf
    // by the IvfTune sweep; pinned here at sf0.001).
    assert(probe == brute, s"probe != brute: $probe")
    // and it really prunes: probed postings < corpus
    val probedRows = postings.join(
      store.read(spark, "ivf_centroids").limit(8).select("cid"), "cid").count()
    assert(probedRows < emb.count())
  }
}
