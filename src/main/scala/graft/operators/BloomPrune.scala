package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.{BloomMightContainFn, Functions}

/** Bloom-filter pre-join pruning (runtime row filter, explicit form).
  *
  * The 100 TB pattern: a selective dimension/build side (say 5% of
  * orders) joins a huge fact side. Without pruning, the fact side
  * shuffles ALL its rows into the sort-merge exchange and the join
  * discards 95% of them after the network hop. With pruning, one
  * bounded aggregation over the build side's keys produces a bloom
  * filter (`df.stat.bloomFilter` merges per-partition sketches —
  * megabytes for tens of millions of keys), and the fact scan drops
  * non-matching rows BEFORE the exchange: shuffle bytes fall by the
  * build side's selectivity, at the cost of an fpp-sized overshoot.
  *
  * Exactness: blooms have no false negatives, so following the probe
  * with the exact join (as `prunedEquiJoin` does) returns exactly the
  * plain join's rows — false positives are eliminated by the join
  * itself. That's why the oracle for the pruned query is the plain
  * SQL join.
  *
  * Spark's `InjectRuntimeFilter` applies this rewrite automatically
  * when column stats justify it; the explicit operator works on any
  * DataFrame (no stats needed), is available to SQL via
  * `bloom_might_contain`, and stays codegen'd (it is a native
  * expression, not a Scala UDF). */
object BloomPrune {

  /** Build a bloom filter over `keyCol` of `build`. One aggregation
    * job; output size is bits(expectedItems, fpp), independent of row
    * count. */
  def buildFilter(build: DataFrame, keyCol: String,
      expectedItems: Long = 1L << 18, fpp: Double = 0.01): BloomFilter =
    build.stat.bloomFilter(keyCol, expectedItems, fpp)

  /** Keep only rows whose `key` might be in the filter — a codegen'd
    * scan-local predicate (pushes below the probe side's exchange). */
  def filterMightContain(probe: DataFrame, key: Column, bf: BloomFilter): DataFrame = {
    Functions.register(probe.sparkSession) // idempotent
    probe.filter(call_function("bloom_might_contain", key,
      lit(BloomMightContainFn.serialize(bf))))
  }

  /** Equi-join with bloom pre-pruning of the probe side: exact result
    * (bloom false positives die in the join), reduced shuffle. */
  def prunedEquiJoin(probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKeyName: String,
      expectedItems: Long = 1L << 18, fpp: Double = 0.01): DataFrame = {
    val bf = buildFilter(build, buildKeyName, expectedItems, fpp)
    filterMightContain(probe, probeKey, bf)
      .join(build, probeKey === build(buildKeyName))
  }
}
