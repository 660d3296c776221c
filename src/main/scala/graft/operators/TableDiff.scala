package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed semantic diff between two table states (S14's reconciliation
  * sibling: the checksum says WHETHER two copies agree, this says
  * WHAT changed): one row per key with
  * `diff_status ∈ added | removed | changed | unchanged`.
  *
  * Plan: one full-outer hash join on the key columns — each side
  * shuffles once on the keys, value comparison is a codegen'd
  * null-safe `<=>` conjunction, no row ever compares against more
  * than its key partner. At 100 TB both sides hash-partition on the
  * same keys (or co-locate via bucketing) and the diff costs one
  * co-partitioned join; the usual consumer aggregates the status
  * column, so the wide row never leaves the exchange.
  *
  * Reference analogue: none (scrapper.py replaces state blindly);
  * this is the audit a migration/backfill pipeline runs before
  * swapping a table pointer.
  */
object TableDiff {

  /** Diff `newDf` against `oldDf` on `keys`. Both frames must carry
    * the same non-key columns (by name); values compare null-safely.
    * Output: the key columns + `diff_status`. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val valCols = oldDf.columns.filterNot(keys.contains).toSeq
    require(valCols == newDf.columns.filterNot(keys.contains).toSeq,
      s"non-key columns must align: old=${valCols.mkString(",")} " +
        s"new=${newDf.columns.filterNot(keys.contains).mkString(",")}")
    val o = oldDf.select(keys.map(col) ++ (lit(true).as("_in_old") +:
      valCols.map(c => col(c).as(s"_o_$c"))): _*)
    val n = newDf.select(keys.map(col) ++ (lit(true).as("_in_new") +:
      valCols.map(c => col(c).as(s"_n_$c"))): _*)
    val changed = valCols.map(c => !(col(s"_o_$c") <=> col(s"_n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(changed, "changed")
          .otherwise("unchanged").as("diff_status"): _*)
  }
}
