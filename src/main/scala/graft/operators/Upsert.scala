package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed MERGE upsert (SURVEY §2 S4/S5) — the reference's
  * `INSERT .. ON CONFLICT(pk) DO UPDATE SET col=excluded.col,
  * nupdates = nupdates + 1` (/root/reference/scrapper.py:188-224),
  * re-expressed as a declarative plan: full-outer join on the key
  * columns + per-column resolution. Catalyst plans the join (broadcast
  * if the update batch is small — the common case for micro-batch
  * upserts — else shuffled hash/sort-merge with AQE skew handling), so
  * the same code scales from 60k rows to 100 TB.
  *
  * Semantics (pinned by UpsertSpec):
  *   - matched key      → every non-key column takes the UPDATE's value
  *                        (even if null — `col=excluded.col`), and the
  *                        counter column increments by 1;
  *   - update-only key  → inserted, counter = 1;
  *   - target-only key  → row kept unchanged;
  *   - update-only COLUMN → schema evolution: the table widens, rows
  *                        the batch doesn't touch read null.
  */
object Upsert {

  def merge(
      target: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      counterCol: Option[String] = Some("nupdates")): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    // Presence flags come from injected non-nullable markers, NOT from
    // key nullability: with the null-safe <=> join a null-key row would
    // otherwise read as "absent" on both sides and be silently mangled.
    val t = target.withColumn("_t_present", lit(1)).alias("t")
    val u = updates.withColumn("_u_present", lit(1)).alias("u")
    val cond: Column = keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _)
    val joined = t.join(u, cond, "full_outer")

    val uPresent = col("u._u_present").isNotNull
    val tPresent = col("t._t_present").isNotNull

    val updateCols = updates.columns.toSet
    val outCols: Seq[Column] = target.columns.toSeq.map { c =>
      if (keys.contains(c)) {
        coalesce(col(s"u.$c"), col(s"t.$c")).as(c)
      } else if (counterCol.contains(c)) {
        when(uPresent && tPresent, col(s"t.$c") + lit(1L))
          .when(uPresent, if (updateCols.contains(c)) coalesce(col(s"u.$c"), lit(1L)) else lit(1L))
          .otherwise(col(s"t.$c"))
          .as(c)
      } else if (updateCols.contains(c)) {
        // SQLite `col = excluded.col`: the update's value wins outright
        // on a matched key, including explicit nulls.
        when(uPresent, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)
      } else {
        col(s"t.$c").as(c)
      }
    }
    // schema evolution: columns the updates carry that the target lacks
    // widen the table — update rows bring their value, pre-existing
    // rows read null (exactly what adding a nullable column means).
    // The widened schema commits atomically with the data (whole-
    // version swap), so readers never see a half-migrated table.
    val newCols: Seq[Column] = updates.columns.toSeq
      .filterNot(c => target.columns.contains(c) || c == "_u_present")
      .map(c => when(uPresent, col(s"u.$c")).otherwise(lit(null)).as(c))
    joined.select(outCols ++ newCols: _*)
  }
}
