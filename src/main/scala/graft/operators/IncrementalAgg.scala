package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized per-key aggregate
  * (SURVEY §2 S4 family — the generalization of the reference's
  * `nupdates = nupdates + 1` conflict rule, /root/reference/
  * scrapper.py:196-200, from "count the conflicts" to "maintain any
  * additive aggregate without recomputing history").
  *
  * Each batch is first collapsed to one row per key (partial+final
  * hash aggregate — the shuffle carries per-key deltas, never the raw
  * batch), then folded into the stored state with a full-outer join
  * that ADDS measures instead of replacing them. At 100 TB the daily
  * cost is O(batch + state-touched), not O(history): the plan never
  * rescans old facts, and Catalyst broadcasts the delta side when a
  * batch touches few keys (the common case for incremental feeds).
  *
  * Additivity is the contract: measures must be mergeable by `+`
  * (counts, sums, and anything built from them — avg = sum/count at
  * read time). Exactness across batch orderings requires associative
  * addition, so route floating-point sums through decimal
  * (`Functions.dsum`-style) — double addition is order-sensitive.
  */
object IncrementalAgg {

  /** Fold one batch of facts into the materialized aggregate table
    * `name` in `store`. `measures` are (output column, aggregate
    * expression over the batch) pairs; every measure column must be
    * additive. Creates the table on first batch.
    */
  def applyBatch(
      spark: SparkSession,
      store: TableStore,
      name: String,
      batch: DataFrame,
      keys: Seq[String],
      measures: Seq[(String, Column)]): Unit = {
    require(keys.nonEmpty && measures.nonEmpty, "need at least one key and one measure")
    val delta = batch
      .groupBy(keys.map(col): _*)
      .agg(measures.head._2.as(measures.head._1),
        measures.tail.map { case (n, c) => c.as(n) }: _*)
    if (!store.exists(spark, name)) {
      store.replace(spark, name, delta)
    } else {
      val t = store.read(spark, name).withColumn("_t_present", lit(1)).alias("t")
      val u = delta.withColumn("_u_present", lit(1)).alias("u")
      val cond = keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _)
      val measureNames = measures.map(_._1)
      val outCols: Seq[Column] =
        keys.map(k => coalesce(col(s"u.$k"), col(s"t.$k")).as(k)) ++
          measureNames.map { m =>
            // additive resolution: present on both → add; else keep the side that has it
            when(col("u._u_present").isNotNull && col("t._t_present").isNotNull,
              col(s"t.$m") + col(s"u.$m"))
              .when(col("u._u_present").isNotNull, col(s"u.$m"))
              .otherwise(col(s"t.$m"))
              .as(m)
          }
      store.replace(spark, name, t.join(u, cond, "full_outer").select(outCols: _*))
    }
  }
}
