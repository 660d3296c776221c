package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY §2 J4): for every probe row, the latest build
  * row with the same key whose timestamp is <= the probe's.
  *
  * Implementation is the union+window trick, not a join: both sides
  * are tagged and unioned, then one pass of `last(_, ignoreNulls)`
  * over a (key, time)-ordered window carries the most recent build
  * value forward onto each probe row. One shuffle on the key, one
  * sort — same cost envelope as a sort-merge join but with no
  * unbounded range-condition blowup, which is what makes it safe at
  * 100 TB (a naive t1 <= t2 join degenerates quadratically inside
  * hot keys).
  */
object AsOfJoin {

  /** @param probe rows wanting a value as of their time
    * @param build rows providing values over time
    * @param key equality column (same name both sides)
    * @param tsCol event-time column (same name both sides)
    * @param valueCols build columns to carry onto probe rows */
  def asOf(probe: DataFrame, build: DataFrame, key: String, tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns
    val pTagged = probe
      .withColumn("_is_probe", lit(1))
      .withColumns(valueCols.map(c => s"_b_$c" -> lit(null).cast(build.schema(c).dataType)).toMap)
    val bTagged = build
      .select((Seq(col(key), col(tsCol), lit(0).as("_is_probe")) ++
        valueCols.map(c => col(c).as(s"_b_$c")) ++
        probeCols.filterNot(Set(key, tsCol)).map(c => lit(null).cast(probe.schema(c).dataType).as(c))): _*)
    // order: build rows first at equal timestamps, so a probe at time t
    // sees a build row stamped exactly t (inclusive as-of). Build rows
    // tying on (ts) are further ordered by their value columns so the
    // carried value is deterministic (last in value order), not
    // partition-layout-dependent.
    val w = Window.partitionBy(col(key))
      .orderBy((Seq(col(tsCol).asc, col("_is_probe").asc) ++
        valueCols.map(c => col(s"_b_$c").asc_nulls_first)): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.map(c =>
      last(col(s"_b_$c"), ignoreNulls = true).over(w).as(s"asof_$c"))
    pTagged.unionByName(bTagged)
      .select((probeCols.map(col) :+ col("_is_probe")) ++ carried: _*)
      .filter(col("_is_probe") === 1)
      .drop("_is_probe")
  }
}
