package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles computed by SORT, not by buffering
  * (SURVEY §2 A4; VERDICT r1 "what's wrong" #3).
  *
  * Spark's built-in `percentile` is a TypedImperativeAggregate that
  * holds EVERY value of a group in executor memory — unbounded state,
  * the thing that OOMs first when a group grows 100×. This operator
  * gets the same exact answer from a window sort + two-row lookup per
  * (group, percentile): sorts spill to disk, the aggregate keeps two
  * doubles per percentile, and the whole plan is shuffle-sort +
  * hash-agg — the shape that survives any group size.
  *
  * Interpolation replicates Spark's `Percentile.getPercentile`
  * exactly (0-based position = (n-1)·p; result =
  * (higher−pos)·v_lo + (pos−lower)·v_hi, collapsed to v_lo when the
  * position is integral), so results are bit-identical to the
  * built-in — pinned by PercentilesSpec.
  */
object Percentiles {

  /** One row per group: `groupCols ++ ps` (columns named by `names`).
    * `valCol` must be numeric; nulls are excluded like the built-in. */
  def exact(df: DataFrame, groupCols: Seq[String], valCol: String,
      ps: Seq[Double], names: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.length == names.length)
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("v"))
    val wn = Window.partitionBy(g: _*)
    val ranked = df
      .filter(col(valCol).isNotNull)
      .select(g :+ col(valCol).cast("double").as("v"): _*)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
    // 0-based position of percentile p in a group of size n
    def pos(p: Double): Column = (col("n") - 1).cast("double") * lit(p)
    val aggCols = ps.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        max(when(col("rn") - 1 === floor(pos(p)), col("v"))).as(s"_lo$i"),
        max(when(col("rn") - 1 === ceil(pos(p)), col("v"))).as(s"_hi$i"))
    } :+ max(col("n")).as("_n")
    val agged = ranked.groupBy(g: _*).agg(aggCols.head, aggCols.tail: _*)
    val outs = ps.zip(names).zipWithIndex.map { case ((p, name), i) =>
      val position = (col("_n") - 1).cast("double") * lit(p)
      val lower = floor(position)
      val higher = ceil(position)
      when(lower === higher, col(s"_lo$i"))
        .otherwise((higher - position) * col(s"_lo$i") +
          (position - lower) * col(s"_hi$i"))
        .as(name)
    }
    // a group whose values are ALL null has no ranked rows, but the
    // built-in still emits it (with NULL percentiles) — restore such
    // groups via a left join from the full group set
    df.select(g: _*).distinct()
      .join(agged, groupCols, "left")
      .select(g ++ outs: _*)
  }
}
