package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/** Mergeable per-group bloom filter over a LONG key column, as a
  * typed Aggregator — the building block for per-FILE bloom sidecars
  * (point-lookup file skipping on columns the layout is NOT clustered
  * by, where zone-map ranges are useless). Long keys only: the store
  * uses it for id columns; hashing wider types can layer on top by
  * pre-hashing to long (xxhash64) on BOTH build and probe.
  *
  * State per group is bits(expectedItems, fpp) — independent of row
  * count, so the aggregate's exchange carries files × filter-size
  * bytes, and partial aggregation merges map-side like any algebraic
  * aggregate. Serialized with the spark util.sketch wire format,
  * probed via [[BloomMightContainFn.mightContain]] (no false
  * negatives — pruning is always safe, fpp only costs extra reads). */
class BloomAgg(expectedItems: Long, fpp: Double)
    extends Aggregator[java.lang.Long, BloomFilter, Array[Byte]] {
  def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
  def reduce(b: BloomFilter, v: java.lang.Long): BloomFilter = {
    // null keys can't match a point lookup; skip them
    if (v != null) b.putLong(v.longValue())
    b
  }
  def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b); a
  }
  def finish(b: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }
  def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAgg {
  /** `agg(BloomAgg.bloomOf(col("id")))` — binary bloom per group. */
  def bloomOf(c: Column, expectedItems: Long = 1L << 16,
      fpp: Double = 0.01): Column =
    org.apache.spark.sql.functions.udaf(
      new BloomAgg(expectedItems, fpp), Encoders.LONG).apply(c)
}
