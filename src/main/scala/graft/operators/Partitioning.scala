package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators for scale (SURVEY §4, north-star "design
  * every operator for 100 TB"): date-partitioned writes so time-range
  * queries prune at the directory level, and salted joins so one hot
  * key can't stall a stage.
  */
object Partitioning {

  /** Write a table date-partitioned (year/month columns derived from a
    * timestamp column). A reader filtering on year/month then scans
    * only the matching directories — `PartitionFilters` in the plan,
    * zero I/O for everything else. This is how the 100 TB upsert
    * avoids whole-table rewrites: a micro-batch touches one (or two)
    * partitions. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_year", year(col(tsCol)))
      .withColumn("p_month", month(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("p_year", "p_month")
      .parquet(path)

  /** Register a table bucketed by a join key (sorted within buckets).
    * Two tables bucketed the same way equi-join WITHOUT a shuffle —
    * each task reads matching bucket files from both sides — which at
    * 100 TB converts the dominant exchange of fact⋈fact joins into
    * pure local I/O. Requires the session catalog (saveAsTable);
    * `spark.sql.warehouse.dir` decides where files land. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a location orphaned by a previous process (dir exists, table not
    // in this metastore) fails managed-table validation — clear it
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Range-clustered sorted layout (the poor man's Z-order for one
    * key): `repartitionByRange` gives every output file a DISJOINT
    * key range, and `sortWithinPartitions` orders rows inside each.
    * Parquet then records tight min/max stats per file/row-group, so
    * a point or range predicate on the key skips every non-matching
    * file at planning time and every non-matching row group at read
    * time. At 100 TB this is the difference between a full scan and
    * touching a handful of files — the layout step pays one range
    * shuffle, once, at write time.
    *
    * numFiles is explicit because range partitioning samples the key
    * distribution: deterministic file count keeps layouts comparable
    * across runs. */
  def sortedWrite(df: DataFrame, key: String, path: String, numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite")
      .parquet(path)

  /** Z-order-clustered layout (the two-dimensional big sibling of
    * `sortedWrite`): rows are range-partitioned and sorted by the
    * Morton interleave of two int keys, so rows close in EITHER
    * dimension cluster into few files and parquet min/max stats can
    * skip files for predicates on either column. A single-column sort
    * can only ever skip on its own column — a predicate on the other
    * one scans everything. Same one-time range-shuffle cost as
    * `sortedWrite`; `ZOrderSpec` pins the both-dimensions skipping
    * property. */
  def zorderWrite(df: DataFrame, keyX: String, keyY: String, path: String,
      numFiles: Int): Unit =
    zorderCluster(df, keyX, keyY, numFiles)
      .write.mode("overwrite")
      .parquet(path)

  /** The clustering transform behind `zorderWrite` (and TableStore
    * .optimizeZOrder): range-partition + sort by the Morton interleave
    * of the two keys after LINEARLY NORMALIZING each into a common
    * 20-bit range. Normalization matters: raw keys of unequal width
    * (say a 13-bit orderkey against an 8-bit partkey) put every
    * split-deciding high bit on the wide key, and the narrow column
    * gets no clustering at all — the classic z-order footgun. The
    * min/max pass is one tiny aggregate (4 values to the driver),
    * bounded at any scale. */
  def zorderCluster(df: DataFrame, keyX: String, keyY: String,
      numFiles: Int): DataFrame = {
    graft.functions.Functions.register(df.sparkSession)
    val r = df.agg(min(col(keyX).cast("long")), max(col(keyX).cast("long")),
      min(col(keyY).cast("long")), max(col(keyY).cast("long"))).head
    if (r.isNullAt(0) || r.isNullAt(2)) return df // empty (or all-null keys): nothing to cluster
    def norm(c: String, lo: Long, hi: Long) = {
      // double scaling: monotone, and overflow-free for the FULL long
      // key range (the earlier integer multiply overflowed past a
      // ~2^43 span); sub-ulp rank ties only blur bucket boundaries,
      // which is irrelevant for a storage layout
      val span = math.max(1L, hi - lo + 1).toDouble
      ((col(c).cast("long") - lit(lo)).cast("double") * 1048575.0 / lit(span)).cast("int")
    }
    val z = call_function("zorder2",
      norm(keyX, r.getLong(0), r.getLong(1)), norm(keyY, r.getLong(2), r.getLong(3)))
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Within-partition z-order clustering: rows keep their hive
    * partition but sort by the Morton interleave of the two keys
    * INSIDE it, so per-partition parquet row-groups carry tight
    * min/max stats on both columns (normalization bounds come from
    * one tiny whole-input aggregate — global bounds are fine, only
    * the within-partition ORDER matters for skipping). Companion to
    * `zorderCluster`, which re-ranges the whole layout and would
    * destroy a hive partitioning. */
  def zorderWithinPartitions(df: DataFrame, partCol: String, keyX: String,
      keyY: String): DataFrame = {
    graft.functions.Functions.register(df.sparkSession)
    val r = df.agg(min(col(keyX).cast("long")), max(col(keyX).cast("long")),
      min(col(keyY).cast("long")), max(col(keyY).cast("long"))).head
    if (r.isNullAt(0) || r.isNullAt(2)) return df
    def norm(c: String, lo: Long, hi: Long) = {
      val span = math.max(1L, hi - lo + 1).toDouble
      ((col(c).cast("long") - lit(lo)).cast("double") * 1048575.0 / lit(span)).cast("int")
    }
    val z = call_function("zorder2",
      norm(keyX, r.getLong(0), r.getLong(1)), norm(keyY, r.getLong(2), r.getLong(3)))
    df.withColumn("_z", z)
      .repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col("_z"))
      .drop("_z")
  }

  /** Distributed inclusive prefix sum (VERDICT r2 missing #2): the
    * global running total that sampling/packing queries need, WITHOUT
    * the classic single-partition `Window.orderBy(...)` (one task
    * holding the whole corpus).
    *
    * Decomposition: the caller names a `bucket` expression that is a
    * MONOTONE coarsening of the order prefix (same sort direction:
    * r1.order < r2.order ⇒ bucket(r1) ≤ bucket(r2) within a stratum —
    * e.g. a hex prefix of the md5 hash the order starts with). Then
    *   cum(r) = Σ over earlier buckets (offset) + local cumsum in r's
    *   bucket,
    * which is exact for ANY bucket granularity, so:
    *   1. local cumsum: window over (strata, bucket) — the ONE
    *      data-sized shuffle, `buckets`-way parallel, each task holds
    *      ~n/buckets rows;
    *   2. offsets: per-(strata, bucket) subtotals (map-side partial
    *      agg) + an exclusive running sum over the TINY summary
    *      (strata×buckets rows — bounded by key cardinality, not by
    *      data: with a 2-hex-char bucket that is 256 rows/stratum; at
    *      100 TB widen the prefix to 4 chars = 65 536);
    *   3. broadcast-join offsets back, add.
    * Identical output to the single-partition window (PrefixSumSpec
    * pins it bit-for-bit), one extra tiny aggregate as the price of
    * unbounded scale. */
  def prefixSum(df: DataFrame, strata: Seq[String], bucket: Column,
      order: Seq[Column], value: Column, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sCols = strata.map(col)
    val b = df.withColumn("_ps_bucket", bucket).withColumn("_ps_val", value)
    val wOff = Window.partitionBy(sCols: _*).orderBy(col("_ps_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy(sCols :+ col("_ps_bucket"): _*)
      .agg(sum(col("_ps_val")).as("_ps_sub"))
      .withColumn("_ps_off", coalesce(sum(col("_ps_sub")).over(wOff), lit(0L)))
      .drop("_ps_sub")
    val wLoc = Window.partitionBy(sCols :+ col("_ps_bucket"): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    b.withColumn("_ps_loc", sum(col("_ps_val")).over(wLoc))
      .join(broadcast(offsets), strata :+ "_ps_bucket")
      .withColumn(out, col("_ps_loc") + col("_ps_off"))
      .drop("_ps_bucket", "_ps_val", "_ps_loc", "_ps_off")
  }

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * random-ish salt in [0, buckets) derived deterministically from
    * other row content; the small side is exploded ×buckets so every
    * salted key finds its partner. Shuffle load for a hot key spreads
    * over `buckets` reducers instead of one.
    *
    * AQE's skew-join split handles most cases at runtime; explicit
    * salting remains the tool when a single key is so hot that even a
    * split partition exceeds executor memory, or when the join is
    * followed by an aggregation keyed the same way. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int = 8): DataFrame = {
    require(buckets > 0)
    // Salt must be DETERMINISTIC per row (hash of row content), not
    // positional: monotonically_increasing_id changes across task
    // retries, which re-routes rows between reducers mid-shuffle and
    // duplicates/loses them (SPARK-23207 class).
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(buckets)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
