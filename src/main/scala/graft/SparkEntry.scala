package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CoreQueries, DedupQueries, LifecycleQueries, MultimodalQueries, StreamQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.all("j3_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ DedupQueries.all ++ TextQueries.all ++ VectorQueries.all ++ StreamQueries.all ++ MultimodalQueries.all ++ LifecycleQueries.all ++ AnalyticsQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ DedupQueries.oracle ++ TextQueries.oracle ++ VectorQueries.oracle ++ StreamQueries.oracle ++ MultimodalQueries.oracle ++ LifecycleQueries.oracle ++ AnalyticsQueries.oracle
}
