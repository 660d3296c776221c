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

  /** One maintained measure: `agg` computes it over a batch, `merge`
    * folds a batch's value into the stored one. The default merge is
    * `+` (counts, sums); sketch-valued measures supply their own —
    * e.g. HLL distinct-count sketches merge with `hll_union`, which is
    * what makes DISTINCT incrementally maintainable at all (a plain
    * count-distinct is not additive across batches, a sketch is). */
  final case class Measure(
      name: String,
      agg: Column,
      merge: (Column, Column) => Column = _ + _)

  /** Fold one batch of facts into the materialized aggregate table
    * `name` in `store`. `measures` are (output column, aggregate
    * expression over the batch) pairs merged by `+`; every measure
    * must be additive. Creates the table on first batch.
    */
  def applyBatch(
      spark: SparkSession,
      store: TableStore,
      name: String,
      batch: DataFrame,
      keys: Seq[String],
      measures: Seq[(String, Column)]): Unit =
    applyBatchM(spark, store, name, batch, keys,
      measures.map { case (n, c) => Measure(n, c) })

  /** General form: measures with explicit merge functions.
    * @param batchId replay guard (see `TableStore.upsert`): an
    *   additive fold applied twice double-counts, so at-least-once
    *   batch drivers MUST pass their monotone batch id — a replayed
    *   batch is then a no-op, and the id commits atomically with the
    *   folded state. */
  def applyBatchM(
      spark: SparkSession,
      store: TableStore,
      name: String,
      batch: DataFrame,
      keys: Seq[String],
      measures: Seq[Measure],
      batchId: Option[Long] = None): Unit = {
    require(keys.nonEmpty && measures.nonEmpty, "need at least one key and one measure")
    if (store.alreadyApplied(spark, name, batchId)) return
    val delta = batch
      .groupBy(keys.map(col): _*)
      .agg(measures.head.agg.as(measures.head.name),
        measures.tail.map(m => m.agg.as(m.name)): _*)
    if (!store.exists(spark, name)) {
      store.replace(spark, name, delta, batchId.map(_.toString))
    } else {
      val t = store.read(spark, name).withColumn("_t_present", lit(1)).alias("t")
      val u = delta.withColumn("_u_present", lit(1)).alias("u")
      val cond = keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _)
      val outCols: Seq[Column] =
        keys.map(k => coalesce(col(s"u.$k"), col(s"t.$k")).as(k)) ++
          measures.map { m =>
            // mergeable resolution: present on both → merge; else keep the side that has it
            when(col("u._u_present").isNotNull && col("t._t_present").isNotNull,
              m.merge(col(s"t.${m.name}"), col(s"u.${m.name}")))
              .when(col("u._u_present").isNotNull, col(s"u.${m.name}"))
              .otherwise(col(s"t.${m.name}"))
              .as(m.name)
          }
      store.replace(spark, name, t.join(u, cond, "full_outer").select(outCols: _*),
        batchId.map(_.toString))
    }
  }
}
