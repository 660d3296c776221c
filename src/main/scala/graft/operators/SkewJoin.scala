package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentiated equi-join for skewed key distributions — the manual
  * salting/splitting answer when a handful of hot keys would pile an
  * entire shuffle partition onto one task. AQE's skew-join splits a
  * skewed SORT-MERGE partition at runtime, but it only triggers
  * inside one shuffle stage; this operator removes the hot keys from
  * the shuffle entirely:
  *
  *   hot  := the top-`hotKeys` left-side keys by frequency
  *   hot rows  → broadcast-hash join (the right side's hot slice is
  *               tiny by definition of "dimension-ish right"), so the
  *               fat left partitions stream map-side, never shuffled
  *   cold rows → the normal shuffled join, now skew-free
  *   result = hot ∪ cold (disjoint by construction)
  *
  * At 100 TB the detection aggregate is one partial+final count on
  * the join key (bytes per distinct key, not per row), and the driver
  * holds `hotKeys` values — both bounded. INNER joins only: null and
  * filtered keys match nothing on either path, so the split is
  * lossless exactly when the join is inner (SkewJoinSpec pins
  * equality and the two-plan shape).
  */
object SkewJoin {

  /** The hot left-side key values, by descending frequency. Bounded
    * driver state: `hotKeys` rows out of a partial+final aggregate. */
  def hotKeyValues(left: DataFrame, leftKey: String, hotKeys: Int): Seq[Any] =
    left.groupBy(col(leftKey)).count()
      .orderBy(col("count").desc, col(leftKey))
      .limit(hotKeys)
      .collect().map(_.get(0)).toIndexedSeq

  def differentiated(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, hotKeys: Int = 16): DataFrame = {
    val hot = hotKeyValues(left, leftKey, hotKeys)
    if (hot.isEmpty) left.join(right, col(leftKey) === col(rightKey))
    else {
      val inHot: Column => Column = c => c.isin(hot: _*)
      val hotJoin = left.filter(inHot(col(leftKey)))
        .join(broadcast(right.filter(inHot(col(rightKey)))),
          col(leftKey) === col(rightKey))
      // isin(null) is NULL, so null-keyed rows land on NEITHER branch
      // — correct for an inner join, where they can't match anyway
      val coldJoin = left.filter(!inHot(col(leftKey)))
        .join(right.filter(!inHot(col(rightKey))),
          col(leftKey) === col(rightKey))
      hotJoin.unionAll(coldJoin)
    }
  }
}
