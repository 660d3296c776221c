package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC changelog application (SURVEY §2 S11) as a reusable operator:
  * the semantics the oracle-pinned `s4_cdc_apply` query spells out
  * inline, factored so the STREAMED sink (`Streams.cdcSink`) folds
  * micro-batches of change rows through the exact same rules.
  *
  * Rules (Debezium-style flattened changelog): within the slice the
  * LATEST change per key wins (`seqCol` descending); `op` = "D" drops
  * the key, "U" replaces-or-inserts the row (absent target key ⇒
  * insert), keys untouched by the slice keep their target row.
  *
  * Applying slices sequentially equals applying their union once
  * whenever each key's changes arrive in `seqCol` order across slices
  * (the CDC transport contract — per-key ordered delivery, what any
  * log-based source provides); that identity is what lets the
  * streamed sink hash-match the one-shot batch oracle.
  *
  * Scale: one window over the CHANGE SLICE (micro-batch-sized, not
  * table-sized) and one key-partitioned full-outer join against the
  * target. At 100 TB the target side pairs with the partitioned
  * store so a slice touches only the partitions its keys live in. */
object Cdc {

  /** Apply `changes` to `target`. `set` maps each target column a "U"
    * row overwrites to its change-side expression (e.g.
    * `"o_orderstatus" -> col("c_status")`); target columns absent
    * from `set` keep their value even on "U". */
  def apply(target: DataFrame, changes: DataFrame, key: String,
      seqCol: String, opCol: String, set: Map[String, Column]): DataFrame = {
    val latest = changes
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(seqCol).desc)))
      .filter(col("_rn") === 1)
    val op = col(s"c.$opCol")
    val cols = target.columns.map { tc =>
      if (tc == key) coalesce(col(s"c.$key"), col(s"t.$key")).as(key)
      else set.get(tc) match {
        case Some(rhs) => when(op === "U", rhs).otherwise(col(s"t.$tc")).as(tc)
        case None => col(s"t.$tc").as(tc)
      }
    }
    target.alias("t")
      .join(latest.alias("c"), col(s"t.$key") === col(s"c.$key"), "full_outer")
      .filter(coalesce(op, lit("K")) =!= "D")
      .select(cols.toIndexedSeq: _*)
  }
}
