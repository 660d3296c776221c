package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Functions.dotd

/** Maximum-inner-product search via the norm-augmentation reduction
  * (Bachrach et al., RecSys'14 — "Speeding up the Xbox recommender"):
  * append sqrt(M² − ‖x‖²) to every corpus vector (M = max corpus
  * norm) and pad the query with 0. Every augmented corpus vector then
  * has IDENTICAL norm M, so
  *
  *   cos(x', q') = (x·q) / (M·‖q‖)
  *
  * is monotone in the raw inner product x·q — MIPS becomes cosine NN
  * over the augmented vectors and is served by the SAME persisted
  * IVF/LSH index machinery, same funnel discipline, one extra
  * dimension. (North-star X2; the brute-force gate is
  * `x2_mips_topk`, VectorQueries.)
  *
  * The augmentation is float-approximate (sqrt of a double
  * difference), but it only steers CANDIDATE GENERATION — callers
  * exact-re-rank the shortlist with the raw dot product over the
  * original vectors, so float noise here can only cost recall, never
  * change a served answer (the x2_ann_topk / x2_ivf_topk discipline;
  * `MipsIndexedSpec` pins shortlist-contains-true-top-k per sf).
  *
  * At 100 TB: M is ONE driver-side double (a max aggregate — the same
  * bounded collect contract as IVF's centroid ranks), the augmented
  * table is a map-only projection of the corpus, and index build /
  * probe cost is exactly the cosine path's.
  */
object Mips {

  /** Max squared corpus norm M² — one bounded (1-value) driver
    * collect. */
  def maxSqNorm(emb: DataFrame, vecCol: String): Double =
    emb.agg(max(dotd(col(vecCol), col(vecCol)))).head().getDouble(0)

  /** Corpus side of the reduction: (idCol, aug) with
    * aug = [x, sqrt(M² − ‖x‖²)] as array<double>. `greatest(0, ·)`
    * guards the max-norm vector itself, where float error can push
    * the difference a hair negative. */
  def augment(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val m2 = maxSqNorm(emb, vecCol)
    val n2 = dotd(col(vecCol), col(vecCol))
    emb.select(col(idCol),
      concat(col(vecCol).cast("array<double>"),
        array(sqrt(greatest(lit(0d), lit(m2) - n2)))).as("aug"))
  }

  /** Query side: pad with a literal 0 — the augmented dot then equals
    * the raw inner product against any augmented corpus vector. */
  def augmentQuery(q: DataFrame, vecCol: String, as: String = "aug"): DataFrame =
    q.select(concat(col(vecCol).cast("array<double>"), array(lit(0d))).as(as))

  /** Build the augmented IVF index once (persisted in `store` under
    * `{name}_centroids` / `{name}_postings`, cid-partitioned — see
    * Ivf.buildIndex) and answer MIPS top-k: IVF cosine probe over the
    * augmented geometry for a `shortlist`-sized candidate set, then
    * EXACT re-rank by the raw inner product over the original
    * vectors, quantized to 1e-6 ints so ranking is engine-exact. */
  def indexedTopK(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
      store: TableStore, name: String, queryId: Long, k: Int,
      shortlist: Int = 50, nprobe: Int = 12): DataFrame = {
    if (!store.exists(spark, s"${name}_centroids") || !store.exists(spark, s"${name}_postings"))
      Ivf.buildIndex(augment(emb, idCol, vecCol), idCol, "aug", store, name)
    val qRaw = emb.filter(col(idCol) === queryId).select(col(vecCol).as("qv"))
    val cands = Ivf.probeTopK(spark, store, name,
      augmentQuery(qRaw, "qv"), queryId, shortlist, nprobe)
    emb.filter(col(idCol) =!= queryId)
      .join(cands.select(col("id").as(idCol)), Seq(idCol), "left_semi")
      .crossJoin(broadcast(qRaw))
      .select(col(idCol),
        round(dotd(col(vecCol), col("qv")) * 1000000d).cast("long").as("dot6"))
      .orderBy(col("dot6").desc, col(idCol)).limit(k)
  }
}
