package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (SURVEY §2 P3 generalized —
  * the reference's per-batch validation gate, scrapper.py:139-144,
  * as a composable rule set a pipeline can assert on any table).
  *
  * Row rules (`Rule`) evaluate in ONE pass: every predicate becomes a
  * conditional counter in a single aggregate over the scan — adding a
  * rule costs an expression, not a job. Uniqueness is the exception
  * (it is irreducibly a grouped count) and runs as one extra keyed
  * aggregate. Report rows are exact integers, so the check composes
  * with the DuckDB oracle like any other query.
  *
  * `gate` is the enforcement form: throw unless every expectation
  * holds — the abort-don't-corrupt semantics of the reference's gate,
  * applied before a store commit.
  */
object Expectations {

  /** A named row-level expectation: `holds` must be true for every row. */
  final case class Rule(name: String, holds: Column)

  def notNull(c: String): Rule = Rule(s"not_null:$c", col(c).isNotNull)
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"in_range:$c", col(c).isNotNull && col(c) >= lo && col(c) <= hi)
  def inSet(c: String, values: Seq[String]): Rule =
    Rule(s"in_set:$c", col(c).isin(values: _*))

  /** One row per rule: (rule, n_rows, n_violations). Row rules fold
    * into a single aggregate; `uniqueKeys` (if any) adds one grouped
    * count whose violation count is rows-in-excess per duplicated key. */
  def report(df: DataFrame, rules: Seq[Rule], uniqueKeys: Seq[String] = Nil): DataFrame = {
    require(rules.nonEmpty || uniqueKeys.nonEmpty, "need at least one expectation")
    val spark = df.sparkSession
    import spark.implicits._
    val rowReport: Option[DataFrame] =
      if (rules.isEmpty) None
      else {
        val aggs = count(lit(1)).as("n_rows") +:
          // outer coalesce: sum over an EMPTY table is null, not 0
          rules.map(r => coalesce(
            sum(when(!coalesce(r.holds, lit(false)), 1L).otherwise(0L)), lit(0L)).as(r.name))
        val one = df.agg(aggs.head, aggs.tail: _*).head
        val n = one.getAs[Long]("n_rows")
        Some(rules.map(r => (r.name, n, one.getAs[Long](r.name))).toDF("rule", "n_rows", "n_violations"))
      }
    val uniqReport: Option[DataFrame] =
      if (uniqueKeys.isEmpty) None
      else {
        val dup = df.groupBy(uniqueKeys.map(col): _*).agg(count(lit(1)).as("_rows_per_key"))
          .agg(sum($"_rows_per_key").as("n_rows"), sum($"_rows_per_key" - 1).as("n_violations"))
          .select(lit(s"unique:${uniqueKeys.mkString(",")}").as("rule"),
            coalesce($"n_rows", lit(0L)).as("n_rows"),
            coalesce($"n_violations", lit(0L)).as("n_violations"))
        Some(dup)
      }
    (rowReport.toSeq ++ uniqReport.toSeq).reduce(_ unionByName _).orderBy("rule")
  }

  /** Referential-integrity expectation — the two-table rule `report`
    * can't express: child rows whose (non-null) foreign key has no
    * match in the parent. SQL FK semantics: a NULL foreign key always
    * passes. One anti-join on the key columns — the plan a 100 TB
    * fact-vs-dim check wants (dim side broadcasts or bloom-prunes;
    * the child is never materialized beyond its key projection).
    * Same report shape as `report`, so callers union the frames. */
  def foreignKeyReport(child: DataFrame, fkCols: Seq[String],
      parent: DataFrame, pkCols: Seq[String], label: String): DataFrame = {
    require(fkCols.nonEmpty && fkCols.length == pkCols.length, "key arity mismatch")
    val spark = child.sparkSession
    import spark.implicits._
    val n = child.count()
    val keyed = child.select(fkCols.map(col): _*).toDF(pkCols: _*)
      .filter(pkCols.map(col(_).isNotNull).reduce(_ && _))
    val orphans = keyed
      .join(parent.select(pkCols.map(col): _*).distinct(), pkCols, "left_anti")
      .count()
    Seq((s"fk:$label", n, orphans)).toDF("rule", "n_rows", "n_violations")
  }

  /** Enforcement: throw unless all expectations hold. The report is in
    * the exception, so the failing batch is diagnosable from the log. */
  def gate(df: DataFrame, rules: Seq[Rule], uniqueKeys: Seq[String] = Nil): DataFrame = {
    val bad = report(df, rules, uniqueKeys).filter(col("n_violations") > 0).collect()
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "expectations failed: " + bad.map(r =>
          s"${r.getAs[String]("rule")}=${r.getAs[Long]("n_violations")}").mkString(", "))
    df
  }
}
