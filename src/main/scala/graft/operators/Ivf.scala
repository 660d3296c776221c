package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Functions.{cosine, dotd}

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * clustering counterpart to Ann's hyperplane LSH (north-star X2).
  *
  * Index: k coarse centroids from a few deterministic Lloyd
  * iterations (init = lowest-id vectors, so results are reproducible
  * run to run); every vector is assigned to its nearest centroid —
  * one `posting list` per centroid, exactly the layout FAISS-style
  * engines use. All centroid math is the codegen'd VecDot; assignment
  * is a broadcast cross join (k is small) + argmin, so each Lloyd
  * pass is one scan.
  *
  * Query: rank centroids by similarity to the probe, search only the
  * `nprobe` nearest clusters' postings, exact-cosine re-rank. Cost is
  * n·(nprobe/k) pair comparisons instead of n — at 100 TB with
  * k=65536 and nprobe=64 that's a 1000× cut, with recall tuned by
  * nprobe.
  */
object Ivf {

  /** Deterministic k-means: init = the k lowest-id vectors, then
    * `iters` Lloyd passes. Returns (centroid_id, centroid array). */
  def trainCentroids(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    var centroids = emb.orderBy(col(idCol)).limit(k)
      .select(monotonically_increasing_id().as("cid"), col(vecCol).cast("array<double>").as("cvec"))
      .collect()
      .zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }
    import spark.implicits._
    for (_ <- 1 to iters) {
      val cdf = centroids.toSeq.toDF("cid", "cvec")
      val assigned = assign(emb, idCol, vecCol, cdf)
      centroids = assigned
        .join(emb.select(col(idCol).as("id"), col(vecCol).as("v")), "id")
        .select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
        // decimal-exact mean: double avg is accumulation-order
        // dependent, which would make centroids (and thus candidate
        // sets) vary run-to-run
        .groupBy("cid", "i").agg(graft.functions.Functions.davg(col("x").cast("double")).as("m"))
        .groupBy("cid").agg(sort_array(collect_list(struct(col("i"), col("m")))).as("ms"))
        .select(col("cid"), expr("transform(ms, e -> e.m)").as("cvec"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
    }
    centroids.toSeq.toDF("cid", "cvec")
  }

  /** Nearest-centroid assignment: broadcast centroids, argmax cosine. */
  def assign(emb: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("sim").desc, col("cid"))
    emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(centroids))
      .select(col("id"), col("cid"), cosine(col("v"), col("cvec")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("cid"))
  }

  /** Top-k by cosine for `queryId`, searching only the postings of the
    * `nprobe` centroids nearest the probe vector. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int, nClusters: Int = 16, nprobe: Int = 8, iters: Int = 3): DataFrame = {
    val centroids = trainCentroids(emb.filter(col(idCol) =!= queryId), idCol, vecCol, nClusters, iters)
    val postings = assign(emb.filter(col(idCol) =!= queryId), idCol, vecCol, centroids)
    val qv = emb.filter(col(idCol) === queryId).select(col(vecCol).as("qv"))
    val probeClusters = centroids.crossJoin(broadcast(qv))
      .select(col("cid"), cosine(col("cvec"), col("qv")).as("csim"))
      .orderBy(col("csim").desc, col("cid")).limit(nprobe)
      .select("cid")
    postings.join(broadcast(probeClusters), "cid")
      .join(emb.select(col(idCol).as("id"), col(vecCol)), "id")
      .crossJoin(broadcast(qv))
      .select(col("id"), cosine(col(vecCol), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }
}
