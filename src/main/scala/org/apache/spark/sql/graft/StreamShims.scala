package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LocalRelation}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The one Spark-internal bridge the store's STREAMING SOURCES need
  * (graft.streaming.StoreTailSource / StoreFeedSource): a V1
  * `Source.getBatch` must return a DataFrame flagged
  * `isStreaming = true` (MicroBatchExecution asserts it), but the
  * batch itself is built with the ordinary batch reader against the
  * store's committed manifest paths. Delta's DeltaSource solves this
  * identically — its classes live under `org.apache.spark.sql.delta`
  * so `private[sql]` members are reachable; this object does the same
  * for graft, and ONLY this (every other graft source stays on public
  * API).
  */
object StreamShims {

  /** Make a batch-built DataFrame returnable from a V1 streaming
    * Source. Scan-shaped plans (the append tail) re-flag their leaves
    * streaming — the downstream streaming planner then pushes column
    * pruning and filters INTO the scan exactly as in batch. Plans
    * containing a JOIN (the keyed change feed's full-outer diff, DV
    * anti-joins) instead wrap the batch plan's own RDD as one opaque
    * streaming leaf (`internalCreateDataFrame(toRdd, …,
    * isStreaming = true)` — the DeltaSource CDC technique): flagging a
    * join's leaves streaming would make the incremental planner treat
    * it as a STATEFUL stream-stream join and corrupt it with state
    * stores. The RDD is lazy — the diff executes once, when the
    * micro-batch runs. */
  def asStreamingBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[DataFrame]
    val analyzed = ds.queryExecution.analyzed
    val hasJoin = analyzed.exists { case _: Join => true; case _ => false }
    if (hasJoin)
      ds.sparkSession.sqlContext.internalCreateDataFrame(
        ds.queryExecution.toRdd, ds.schema, isStreaming = true)
    else
      Dataset.ofRows(ds.sparkSession, analyzed.transformUp {
        case lr: LogicalRelation => lr.copy(isStreaming = true)
        case l: LocalRelation => l.copy(isStreaming = true)
      })
  }
}
