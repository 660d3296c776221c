package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Functions.{cosine, dotd}

/** Approximate nearest-neighbor search over an embedding column
  * (SURVEY §2 X2 scale path): random-hyperplane (sign) LSH.
  *
  * Index side: every vector gets `tables` bucket ids; bucket id =
  * the sign-bit pattern of `bits` fixed pseudo-random hyperplane dot
  * products (VecDot — codegen'd). One explode (×tables) and that's
  * the whole index: O(n·tables·bits·dim) map work, no shuffle.
  *
  * Query side: probe vectors compute the same buckets; an equi-join
  * on (table, bucket) yields candidates (the only shuffle, and for a
  * single probe it broadcasts); exact cosine + top-k re-rank runs on
  * candidates only. Brute force compares the probe against all n
  * vectors; LSH compares against the expected bucket population —
  * n·tables/2^bits — so at 100 TB with (say) 24 bits the candidate
  * set shrinks by ~6 orders of magnitude while recall is tuned by
  * `tables`.
  *
  * Hyperplanes are derived from a fixed seed (deterministic plans,
  * reproducible results — and the same literal arrays ship to every
  * executor as part of the plan, ~tables·bits·dim·8 bytes).
  */
object Ann {

  /** Deterministic pseudo-random unit-free hyperplanes [table][bit][dim]. */
  def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long = 42L): Array[Array[Array[Double]]] = {
    val rnd = new Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** (id, table, bucket) index rows for a vector table.
    *
    * Relational shape: the hyperplanes are a tiny broadcast DataFrame
    * (t, bit, plane); vectors cross-join it (tables·bits rows per
    * vector, each computing ONE codegen'd VecDot) and a partial-agg
    * groupBy packs sign bits into bucket ids. The alternative — one
    * projection containing tables×bits inline dot products — generates
    * a method too large for janino, silently degrading the whole
    * operator to interpreted eval. */
  def bucketIndex(df: DataFrame, idCol: String, vecCol: String,
      planes: Array[Array[Array[Double]]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val planesDf = planes.zipWithIndex.flatMap { case (tp, t) =>
      tp.zipWithIndex.map { case (p, b) => (t, b, p.toSeq) }
    }.toSeq.toDF("t", "bit", "plane")
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(planesDf))
      .select(col("id"), col("t"),
        when(dotd(col("v"), col("plane")) >= 0d,
          expr("shiftleft(1L, bit)")).otherwise(lit(0L)).as("bitval"))
      .groupBy(col("id"), col("t"))
      .agg(sum(col("bitval")).as("b"))
  }

  /** Top-k most-cosine-similar vectors to `queryId`, searching only
    * LSH bucket collisions. Output: (id, sim) ordered desc. */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int, tables: Int = 96, bits: Int = 6, seed: Long = 42L,
      dim: Option[Int] = None): DataFrame = {
    // Infer the vector width from the data unless given: a wrong dim
    // makes every hyperplane dot null, which buckets EVERY vector to 0
    // and silently degrades LSH to a full scan.
    val d = dim.getOrElse(
      emb.select(size(col(vecCol))).head.getInt(0))
    val planes = hyperplanes(tables, bits, d, seed)
    val index = bucketIndex(emb.filter(col(idCol) =!= queryId), idCol, vecCol, planes)
    val probe = bucketIndex(emb.filter(col(idCol) === queryId), idCol, vecCol, planes)
      .select(col("t").as("pt"), col("b").as("pb"))
    val candidates = index
      .join(broadcast(probe), col("t") === col("pt") && col("b") === col("pb"))
      .select("id").distinct()
    val qv = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"))
    candidates
      .join(emb.withColumnRenamed(idCol, "id"), "id")
      .crossJoin(broadcast(qv))
      .select(col("id"), cosine(col(vecCol), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }
}
