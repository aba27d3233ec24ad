package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.{CardanoWriter, Extract}

/** Structured Streaming analogue of the reference's hand-rolled
  * micro-batching chain-sync loop (/root/reference/ogmios_parquet.py:
  * 574-818, SURVEY.md §2.9):
  *
  *  - source: any streaming DataFrame of block JSON (file source over a
  *    landing directory, socket, or MemoryStream in tests) replaces the
  *    WebSocket client + request pipelining (:671-675) — Spark manages
  *    offsets/backpressure where the reference counts in-flight sends
  *  - micro-batch: `foreachBatch` replaces the per-slot-group buffers
  *    flushed every 20k slots (:748-767); each batch runs the SAME
  *    batch extractors and appends slot-group partitions — exactly-once
  *    bookkeeping comes from the checkpoint instead of manual cursors
  *  - the merge+compress second phase (:523-571) disappears: every
  *    append is already final columnar zstd
  *
  * Rollbacks: the reference acknowledges-but-ignores RollBackward
  * messages (:813-814); here they are HANDLED — a message of the form
  * `{"rollback": {"slot": N}}` in the stream truncates every table to
  * `slot <= N` via `CardanoWriter.rollbackTo` (whole slot groups above
  * the boundary are dropped as directories; the boundary group is
  * rewritten), after which the replacement chain appends normally.
  * Within a micro-batch, ordering matters: old-chain blocks delivered
  * BEFORE a RollBackward in the same batch must not survive it. With a
  * monotonic `seqCol` on the source (a Kafka offset, a file line
  * number), the batch is replayed in true sequence order — append the
  * segment before each rollback, truncate, continue. Without one, the
  * rollback (the minimum point, if several) is applied FIRST and every
  * block row is treated as post-rollback chain — correct only for
  * sources that never buffer an old-chain block and its rollback into
  * one batch.
  */
object StreamIngest {

  /** Start the ingest stream: block JSON in `jsonCol` → 11 Cardano
    * tables, slot-group-partition-appended under `baseDir`; rollback
    * messages truncate before the batch's blocks append. With
    * `corruptDir` set, rows whose JSON fails to parse are appended
    * verbatim to that quarantine directory (dead-letter channel)
    * instead of being silently dropped.
    */
  def start(blocks: DataFrame, baseDir: String, checkpointDir: String,
      jsonCol: String = "json", corruptDir: Option[String] = None,
      seqCol: Option[String] = None): StreamingQuery =
    blocks.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val rbSlot = get_json_object(col(jsonCol), "$.rollback.slot").cast("long")
        val nonRollback = batch.filter(rbSlot.isNull)
        corruptDir.foreach { dir =>
          // per-batch subdir + overwrite makes the quarantine write
          // idempotent under micro-batch retry: a replayed batch
          // rewrites its own audit records instead of appending
          // duplicates (the table appends below stay at-least-once —
          // documented contract — but the audit channel must not
          // inflate counts)
          Extract.corruptRecords(nonRollback, jsonCol)
            .select(col(jsonCol).cast("string"))
            .write.mode("overwrite").text(s"$dir/batch=$batchId")
        }
        def rollback(point: Long): Unit =
          Extract.tableNames.foreach(t =>
            CardanoWriter.rollbackTo(spark, baseDir, t, point))
        def append(seg: DataFrame): Unit = {
          // one parse per segment, shared by the 10 table projections
          val parsed = Extract.parse(seg, jsonCol).cache()
          try
            Extract.allTables(parsed).foreach { case (t, df) =>
              CardanoWriter.write(df, baseDir, t, mode = "append")
            }
          finally parsed.unpersist()
        }
        seqCol match {
          case Some(sc) =>
            // true sequential replay: blocks between consecutive
            // rollbacks append before the rollback truncates
            val rollbacks = batch
              .select(col(sc).cast("long").as("seq"), rbSlot.as("rb"))
              .filter(col("rb").isNotNull).orderBy("seq")
              .collect().map(r => (r.getLong(0), r.getLong(1)))
            var prev: Option[Long] = None
            rollbacks.foreach { case (seq, point) =>
              val lower = prev.map(col(sc).cast("long") > _).getOrElse(lit(true))
              append(nonRollback.filter(lower && col(sc).cast("long") < seq))
              rollback(point)
              prev = Some(seq)
            }
            append(prev.fold(nonRollback)(p =>
              nonRollback.filter(col(sc).cast("long") > p)))
          case None =>
            // unordered batch: rollback first, all blocks = new chain
            val rb = batch.select(rbSlot.as("rb")).filter(col("rb").isNotNull)
              .agg(min("rb")).collect()(0)
            if (!rb.isNullAt(0)) rollback(rb.getLong(0))
            append(nonRollback)
        }
      }
      .start()

  /** Watermarked event-time rollup — the streaming twin of q16's batch
    * time-bucketing: per-hour per-type counts/sums over a stream with
    * event-time column `ts` (TimestampType), tolerating 1 hour of
    * lateness before a bucket finalizes.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("bucket.start").as("bucket_start"), col("event_type"),
        col("cnt"), col("sum_value"))


  /** Built-in session-window aggregation — the DECLARATIVE twin of the
    * custom [[sessionize]] stateful processor: `session_window(ts, gap)`
    * merges events of one user into dynamic windows that extend while
    * events keep arriving within `gap` and close when the watermark
    * passes last-event + gap. Same gap semantics as sessionize /
    * q22's batch lag+cumsum idiom, expressed as a groupBy — Spark
    * manages the merging session state; use the custom processor only
    * when per-session logic exceeds what an aggregate can say (e.g.
    * emitting mid-session updates). State is keyed by (user, window)
    * and expires with the watermark — bounded, ingest-scale safe.
    */
  def sessionWindowRollup(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Watermarked stream-stream interval join — the attribution shape: a
    * `cause` event matched to every `effect` event of the same user
    * within `maxLagMinutes` after it. Both sides carry watermarks and
    * the join condition bounds event time on BOTH ends, so Spark can
    * expire join state once the watermark passes — the property that
    * lets two unbounded streams join with bounded memory (an unbounded
    * condition would hold every row forever). Batch twin: q21's as-of
    * join family.
    *
    * joinType `left_outer` additionally emits every UNMATCHED cause
    * with null effect columns — but only once the watermark passes the
    * cause's lag window (before that, a match could still arrive), the
    * semantics that make streaming outer joins correct rather than
    * eager-and-wrong.
    */
  def correlate(cause: DataFrame, effect: DataFrame,
      maxLagMinutes: Int, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "leftouter").contains(joinType.toLowerCase.replace("_", "")),
      s"correlate supports inner/left_outer, not '$joinType'")
    val c = cause
      .select(col("user_id"), col("ts").as("cause_ts"),
        col("event_type").as("cause_type"))
      .withWatermark("cause_ts", s"$maxLagMinutes minutes")
    val e = effect
      .select(col("user_id").as("e_user"), col("ts").as("effect_ts"),
        col("event_type").as("effect_type"))
      .withWatermark("effect_ts", s"$maxLagMinutes minutes")
    c.join(e,
      col("user_id") === col("e_user") &&
        col("effect_ts") >= col("cause_ts") &&
        col("effect_ts") <= col("cause_ts") + expr(s"INTERVAL $maxLagMinutes MINUTES"),
      joinType)
      .select(col("user_id"), col("cause_ts"), col("cause_type"),
        col("effect_ts"), col("effect_type"))
  }

  /** Streaming exact deduplication — d01's continuous twin: first
    * occurrence of each content hash passes, later duplicates are
    * dropped, across micro-batches. `dropDuplicatesWithinWatermark`
    * keys the state store on the hash and expires entries once the
    * watermark passes (bounded state — the property that lets this run
    * forever at ingest scale; an unbounded `dropDuplicates` would
    * accumulate every hash ever seen). Duplicates arriving further
    * apart than the watermark delay are admitted again — the standard
    * streaming-dedup contract; the batch d01 pass is the full-history
    * backstop.
    */
  def dedupStream(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Custom stateful streaming: gap-based sessionization per user via
    * flatMapGroupsWithState — the KeyValueGroupedDataset custom-state
    * path for semantics windowed aggs can't express (a session ends
    * only when the event-time watermark passes last-event + gap).
    * Emits one row per CLOSED session; open sessions live in the state
    * store across micro-batches.
    */
  def sessionize(events: org.apache.spark.sql.Dataset[SessionEvent],
      gapMs: Long): org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: close and emit
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.count, s.last - s.start))
          } else {
            // interval merge of the carried-over open session with this
            // batch's events, ORDERED BY START TIME: split on every gap,
            // so several gap-separated sessions in one micro-batch each
            // close separately, and an out-of-order event EARLIER than
            // the open session's start minus the gap forms its own
            // (immediately closed) session instead of being lumped in —
            // both matching the q22 batch twin's sort-then-split.
            val items = (state.getOption.toSeq ++
                batch.map(e => SessionState(1L, e.ts.getTime, e.ts.getTime)))
              .sortBy(s => (s.start, s.last))
            val sessions = scala.collection.mutable.ArrayBuffer.empty[SessionState]
            items.foreach { iv =>
              sessions.lastOption match {
                case Some(m) if iv.start <= m.last + gapMs =>
                  sessions(sessions.length - 1) = SessionState(
                    m.count + iv.count, m.start, math.max(m.last, iv.last))
                case _ => sessions += iv
              }
            }
            if (sessions.isEmpty) Iterator.empty
            else {
              // every session but the last is already gap-closed in-batch
              val open = sessions.last
              state.update(open)
              // clamp: setTimeoutTimestamp throws if the target is at or
              // before the current watermark (a late-but-within-watermark
              // event can put last+gap behind it)
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, open.last + gapMs))
              sessions.init.iterator
                .map(s => SessionOut(userId, s.count, s.last - s.start))
            }
          }
      }
  }
}

/** One event of the sessionization stream. */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)

/** Open-session state held in the state store between micro-batches. */
case class SessionState(count: Long, start: Long, last: Long)

/** A closed session. */
case class SessionOut(user_id: Long, n_events: Long, duration_ms: Long)
