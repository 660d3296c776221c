package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized equi-JOIN —
  * IncrementalAgg's two-sided sibling (the classical delta-join IVM
  * rule, Blakeley et al. SIGMOD'86): when insert batches (ΔA, ΔB)
  * arrive, the new join rows are exactly
  *
  *   ΔM = ΔA ⋈ B_prev  ∪  A_prev ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * so maintaining M = A ⋈ B costs O(Δ ⋈ stored) per batch — the
  * stored-vs-stored term is never recomputed, and Catalyst broadcasts
  * the Δ side when a batch is small (the common incremental-feed
  * case). At 100 TB: each batch's work is the two delta joins plus
  * three partition-append commits; history is never rescanned.
  *
  * Storage: sides and output live PARTITIONED BY BATCH NUMBER in the
  * store, so an "append" is a `replacePartitions` of exactly the new
  * batch's partition — untouched history never moves, and the commit
  * is atomic per table.
  *
  * Idempotence discipline (crash/replay safety WITHOUT a cross-table
  * transaction): every read of a stored side filters `bn < batch` —
  * partition-pruned, so it costs nothing — which makes the delta
  * independent of how much of a crashed attempt landed. A replayed
  * batch recomputes the identical ΔM (same-partition overwrite), and
  * a partially-committed attempt (say `left` landed but `out` did
  * not) cannot double-count ΔA ⋈ ΔB through the stored side. Batch
  * numbers must be dense increasing from 0, one pair per batch.
  *
  * Contract: INSERT-ONLY deltas with disjoint non-key columns (the
  * relational IVM insert rule; updates/deletes route through the
  * CDC/MOR machinery instead), and a key pair may arrive in any
  * batch combination — cross-batch matches are exactly what the
  * A_prev/B_prev terms catch. */
object IncrementalJoin {

  private def side(name: String, which: String) = s"${name}_$which"

  /** Rows of stored side `which` from batches strictly before `bn`
    * (partition-pruned; empty frame with the right schema if the
    * table does not exist yet). */
  private def prev(spark: SparkSession, store: TableStore, name: String,
      which: String, bn: Long, like: DataFrame): DataFrame =
    if (!store.exists(spark, side(name, which))) like.limit(0)
    else store.read(spark, side(name, which))
      .filter(col("_ij_bn") < bn).drop("_ij_bn")

  /** Fold one insert-batch pair into the materialized join `name`.
    * Either delta may be empty (`null` is not accepted — pass an
    * empty frame). Returns the number of new join rows. */
  def applyBatch(spark: SparkSession, store: TableStore, name: String,
      dA: DataFrame, dB: DataFrame, keys: Seq[String], bn: Long): Long = {
    require(keys.nonEmpty, "need at least one join key")
    val overlap = (dA.columns.toSet intersect dB.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, both sides carry: ${overlap.mkString(", ")}")
    val aPrev = prev(spark, store, name, "left", bn, dA)
    val bPrev = prev(spark, store, name, "right", bn, dB)
    val dM = dA.join(bPrev, keys)
      .unionByName(aPrev.join(dB, keys))
      .unionByName(dA.join(dB, keys))
    store.replacePartitions(spark, side(name, "out"),
      dM.withColumn("_ij_bn", lit(bn)), "_ij_bn")
    store.replacePartitions(spark, side(name, "left"),
      dA.withColumn("_ij_bn", lit(bn)), "_ij_bn")
    store.replacePartitions(spark, side(name, "right"),
      dB.withColumn("_ij_bn", lit(bn)), "_ij_bn")
    store.read(spark, side(name, "out"))
      .filter(col("_ij_bn") === bn).count()
  }

  /** The maintained join — every batch's output rows, no recompute. */
  def read(spark: SparkSession, store: TableStore, name: String): DataFrame =
    store.read(spark, side(name, "out")).drop("_ij_bn")

  /** Exactly batch `bn`'s delta rows ΔM of the maintained join
    * (partition-pruned single-partition read) — the hook downstream
    * IVM consumers fold from: γ over insert-only deltas distributes,
    * so an aggregate view over this join maintains itself by folding
    * γ(ΔM_bn) per batch and never re-reads the full join. */
  def readBatch(spark: SparkSession, store: TableStore, name: String, bn: Long): DataFrame =
    store.read(spark, side(name, "out")).filter(col("_ij_bn") === bn).drop("_ij_bn")

  /** Compact batches 0..upto of all three tables into one partition
    * each (`bn = upto`), dropping the subsumed partitions in the same
    * atomic commit — after 10k hourly batches the store would
    * otherwise carry 10k tiny partitions per table, and every
    * stored-side read would list them all. Per-table atomic; a crash
    * between tables is safe because compaction only MOVES rows to a
    * bn that every future `bn < batch` read still includes. Contract:
    * the next applyBatch's bn must be > upto (compaction folds
    * history forward, so a bn at-or-below `upto` would see its own
    * delta in the stored side). Idempotent — re-running is a same-
    * content rewrite. */
  def compact(spark: SparkSession, store: TableStore, name: String, upto: Long): Unit =
    Seq("left", "right", "out").foreach { w =>
      val t = side(name, w)
      if (store.exists(spark, t)) {
        val all = store.read(spark, t).filter(col("_ij_bn") <= upto)
        store.replacePartitions(spark, t,
          all.withColumn("_ij_bn", lit(upto)), "_ij_bn",
          dropIfUnwritten = (0L until upto).map(b => s"_ij_bn=$b"))
      }
    }
}
