package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) storage for co-located joins — the
  * second half of the scale story next to zone maps: zone maps kill
  * I/O on range predicates, bucketing kills the EXCHANGE on repeated
  * equi-joins/aggregations over the same key. A table bucketed by its
  * join key is written already hash-partitioned; two tables bucketed
  * the same way join with zero shuffle on either side — at 100 TB
  * that's the difference between an all-to-all of the fact table per
  * query and none, paid once at write time.
  *
  * Spark-native: this is `bucketBy` + `saveAsTable` (the only API
  * Catalyst recognizes for output-partitioning-aware scans), wrapped
  * so the physical files live under an explicit path and rebuilds are
  * idempotent per JVM. The catalog entry is session-scoped (in-memory
  * catalog); the parquet files persist and are rewritten by the next
  * session's ensure — a build-once/probe-many artifact like the ANN
  * and IVF indexes. */
object Bucketing {

  /** Register `df` as a bucketed table (hash-bucketed and sorted by
    * `keys`, `n` buckets) if this session hasn't yet. Returns the
    * catalog-qualified name to `spark.table(..)`. */
  def ensureBucketed(spark: SparkSession, db: String, table: String,
      df: => DataFrame, keys: Seq[String], n: Int, path: String): String = {
    // one-file-per-bucket sorted scans only expose their ordering
    // behind this flag (off by default since 3.0 because MULTI-file
    // buckets would need a merge-read; our writer guarantees single
    // files, where the ordering is simply true). Scoped: the flag
    // changes nothing for non-bucketed scans.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val fq = s"$db.$table"
    if (!spark.catalog.tableExists(fq)) {
      // one writer task per bucket (repartition hash == bucket hash):
      // each bucket lands in exactly ONE file, which is the condition
      // under which the scan exposes the written sort order and the
      // SMJ drops its per-side Sort, not just its Exchange
      df.repartition(n, keys.map(org.apache.spark.sql.functions.col): _*)
        .write.mode("overwrite")
        .bucketBy(n, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .option("path", path)
        .format("parquet")
        .saveAsTable(fq)
    }
    fq
  }
}
