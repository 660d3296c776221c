package graft.sources

import java.util

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 table serving a merge-on-read (deletion-vector-pending) store
  * table through SQL (SURVEY §2 S6/S14; closes VERDICT r7 missing #3
  * — previously a pending-DV table REFUSED SQL reads until
  * compaction). Delegates everything to the underlying
  * `ParquetTable` — column pruning, filter pushdown, and partition
  * pruning all reach the parquet scan unchanged — and applies the DV
  * as a per-row key-set filter inside the partition readers, the
  * exact anti-join-on-keys semantics of `TableStore.read` (null keys
  * never match, so rows with null keys survive, matching LEFT ANTI).
  *
  * Mechanics: the scan builder forces the DV key columns into the
  * delegate's required schema (so pruned queries like COUNT(*) can
  * still evaluate membership), readers drop rows whose key tuple is
  * in the DV set and project back down to the requested columns. The
  * DV key set ships to executors as ONE broadcast (collected at scan
  * planning, not analysis) — the DV is bounded by deletes since the
  * last compaction, the same smallness contract `TableStore.read`
  * relies on for its broadcast anti-join; compaction folds it away
  * and the catalog then serves the plain `ParquetTable` again.
  */
class DvParquetTable(base: ParquetTable, dvKeys: Seq[String], dvPaths: Seq[String])
    extends Table with SupportsRead {
  override def name(): String = base.name
  override def schema(): StructType = base.schema
  override def partitioning(): Array[Transform] = base.partitioning()
  override def properties(): util.Map[String, String] = base.properties()
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DvScanBuilder(
      base.newScanBuilder(options).asInstanceOf[FileScanBuilder],
      schema(), dvKeys, dvPaths)
}

/** Wraps the parquet scan builder: pushdown delegates verbatim;
  * pruning widens the delegate's schema by the DV key columns. */
class DvScanBuilder(delegate: FileScanBuilder, tableSchema: StructType,
    dvKeys: Seq[String], dvPaths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters {

  private var requested: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit = {
    requested = requiredSchema
    val missing = dvKeys.filterNot(k => requiredSchema.fieldNames.contains(k))
    delegate.pruneColumns(StructType(
      requiredSchema.fields ++ missing.map(tableSchema(_))))
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    delegate.pushFilters(filters)
  override def pushedFilters: Array[Predicate] = delegate.pushedFilters

  override def build(): Scan = new DvScan(delegate.build(), requested, dvKeys, dvPaths)
}

class DvScan(delegate: Scan, requested: StructType,
    dvKeys: Seq[String], dvPaths: Seq[String]) extends Scan {

  override def readSchema(): StructType = requested
  override def description(): String =
    s"DvScan(keys=${dvKeys.mkString(",")}) ${delegate.description()}"

  override def toBatch: Batch = {
    val spark = SparkSession.active
    // collect the DV key tuples in their INTERNAL representation
    // (UTF8String etc. — the same values the parquet readers produce)
    // and broadcast once. Bounded by deletes-since-compaction.
    val wide = delegate.readSchema()
    val keyTypes = dvKeys.map(k => wide(k).dataType)
    val dvSet: Set[Seq[Any]] = spark.read.parquet(dvPaths: _*)
      .select(dvKeys.map(org.apache.spark.sql.functions.col): _*)
      .queryExecution.toRdd.map(_.copy()).collect()
      .map(r => keyTypes.indices.map(i =>
        if (r.isNullAt(i)) null else r.get(i, keyTypes(i))).toVector: Seq[Any])
      .toSet
    val bc = spark.sparkContext.broadcast(dvSet)
    new DvBatch(delegate.toBatch, wide, requested, dvKeys, bc)
  }
}

class DvBatch(delegate: Batch, wide: StructType, requested: StructType,
    dvKeys: Seq[String], dv: Broadcast[Set[Seq[Any]]]) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = delegate.planInputPartitions()
  override def createReaderFactory(): PartitionReaderFactory = {
    val keyOrds = dvKeys.map(wide.fieldIndex).toArray
    val keyTypes = keyOrds.map(wide(_).dataType)
    val outOrds = requested.fieldNames.map(wide.fieldIndex)
    val outTypes = outOrds.map(wide(_).dataType)
    new DvReaderFactory(delegate.createReaderFactory(), keyOrds, keyTypes,
      outOrds, outTypes, dv)
  }
}

class DvReaderFactory(delegate: PartitionReaderFactory,
    keyOrds: Array[Int], keyTypes: Array[DataType],
    outOrds: Array[Int], outTypes: Array[DataType],
    dv: Broadcast[Set[Seq[Any]]]) extends PartitionReaderFactory {

  // row-based reads only: the DV filter evaluates per row. This costs
  // the vectorized reader ONLY while a DV is pending — compaction
  // restores the plain columnar ParquetTable path.
  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val inner = delegate.createReader(partition)
    val dvSet = dv.value
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          val key: Seq[Any] = keyOrds.indices.map(i =>
            if (r.isNullAt(keyOrds(i))) null else r.get(keyOrds(i), keyTypes(i))).toVector
          // null keys never match a DV entry — LEFT ANTI semantics
          if (key.contains(null) || !dvSet.contains(key)) { cur = r; return true }
        }
        false
      }
      override def get(): InternalRow = {
        val out = new GenericInternalRow(outOrds.length)
        var i = 0
        while (i < outOrds.length) {
          out.update(i, if (cur.isNullAt(outOrds(i))) null else cur.get(outOrds(i), outTypes(i)))
          i += 1
        }
        out
      }
      override def close(): Unit = inner.close()
    }
  }
}
