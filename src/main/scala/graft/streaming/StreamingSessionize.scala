package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Gap-based sessionization over UNBOUNDED streams — the streaming
  * analogue of [[graft.ops.Sessionize]], emitting one summary row per
  * CLOSED session. A session closes when the event-time watermark
  * passes its end by more than the gap: no later event can extend it
  * (anything that could arrives above the watermark), so emission is
  * exactly-once per session without retraction — append mode.
  *
  * Mechanism: `flatMapGroupsWithState` keyed by the session key. Each
  * micro-batch buffers the key's new rows; rows at or below the
  * watermark finalize in time order through the same gap automaton the
  * batch operator expresses as windows. State per key = the open
  * session's (id, bounds, count) + the pending buffer — O(rows inside
  * the lateness horizon), NOT O(stream): the watermark bounds state,
  * the [[Ingest.dedupe]] discipline. Spark's own
  * `session_window(gap)` aggregation covers the count/bounds case;
  * this operator additionally carries the batch-compatible PER-KEY
  * SESSION ID (1-based, so stream output can be joined/compared
  * against [[graft.ops.Sessionize.summarize]] directly) — ids are why
  * it needs custom state at all.
  *
  * Scale shape: one `groupByKey` shuffle; per-key sequential
  * finalization, fully parallel across keys — the batch operator's
  * partitioning held open over time.
  */
object StreamingSessionize {

  /** canonical streaming event */
  case class SEvent(key: String, time: Long, seq: Long)

  /** one closed session */
  case class Session(key: String, session_id: Long, n_events: Long,
      start_time: Long, end_time: Long)

  /** open session + pending rows per key */
  case class SessState(sessionId: Long, nEvents: Long, startTime: Long,
      endTime: Long, open: Boolean, pending: List[SEvent])

  /** watermark carrier (the event-time column must survive into the
    * stateful operator) */
  case class WEvent(e: SEvent, ts: java.sql.Timestamp)

  /** Close-out automaton over time-ordered finalized rows: extend the
    * open session while gaps stay <= gap, else close and start anew. */
  private def advance(rows: Seq[SEvent], st0: SessState, gapNs: Long)
      : (List[Session], SessState) = {
    var st = st0
    val out = List.newBuilder[Session]
    rows.foreach { e =>
      if (!st.open)
        st = SessState(st.sessionId + 1, 1L, e.time, e.time,
          open = true, Nil)
      else if (e.time - st.endTime > gapNs) {
        out += Session(e.key, st.sessionId, st.nEvents, st.startTime,
          st.endTime)
        st = SessState(st.sessionId + 1, 1L, e.time, e.time,
          open = true, Nil)
      } else
        // max(): late-row dropping keeps finalized rows monotone across
        // batches, but clamping makes bound regression impossible by
        // construction
        st = st.copy(nEvents = st.nEvents + 1,
          endTime = math.max(st.endTime, e.time))
    }
    (out.result(), st)
  }

  /** `lateness` is the out-of-orderness horizon; it bounds state and
    * emission delay. `gapNs` is the session gap in event-time ns.
    * Returns the append-mode stream of closed sessions. Keys that go
    * silent still finalize: an event-time timeout re-invokes the key
    * once the watermark can close its open session or ripen a buffered
    * row, so the last session of a dying key emits without requiring
    * more traffic on that key. */
  def sessions(spark: SparkSession, stream: Dataset[SEvent],
      gapNs: Long, lateness: String = "10 seconds"): Dataset[Session] = {
    import spark.implicits._
    require(gapNs > 0, "gap must be positive")
    val watermarked = stream
      .withColumn("ts", timestamp_micros(expr("time div 1000")))
      .withWatermark("ts", lateness)
      .select(struct(col("key"), col("time"), col("seq")).as("e"),
        col("ts"))
      .as[WEvent]
    watermarked.groupByKey(_.e.key)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[WEvent], state: GroupState[SessState]) =>
          val st = state.getOption.getOrElse(
            SessState(0L, 0L, 0L, 0L, open = false, Nil))
          val wmNs = state.getCurrentWatermarkMs() * 1000000L
          // Spark does NOT auto-drop late rows for this operator
          // (unlike windowed aggregations): an incoming row at or below
          // the watermark is beyond the lateness horizon — its region
          // already finalized — and must be dropped here, per watermark
          // semantics, or it would re-enter `ripe` and corrupt the open
          // session's bounds. Buffered rows are exempt: they were above
          // the watermark when they arrived.
          val incoming = it.map(_.e).filter(_.time > wmNs).toList
          val all = (st.pending ++ incoming).sortBy(e => (e.time, e.seq))
          // finalize rows the watermark guarantees complete; ALSO
          // close the open session once the watermark has passed its
          // end by more than the gap — no in-range event can follow
          val (ripe, still) = all.partition(_.time <= wmNs)
          val (closed, st1) = advance(ripe, st.copy(pending = Nil), gapNs)
          // buffered rows all sit ABOVE the watermark, so once the
          // watermark clears the open session's end by more than the
          // gap, nothing — buffered or future — can extend it
          val (flushed, st2) =
            if (st1.open && wmNs - st1.endTime > gapNs)
              (List(Session(key, st1.sessionId, st1.nEvents,
                st1.startTime, st1.endTime)), st1.copy(open = false))
            else (Nil, st1)
          state.update(st2.copy(pending = still))
          // re-arm the wake-up while anything is unfinished: the open
          // session closes when the watermark passes end + gap, and
          // `still` (sorted) ripens head-first. Clamp above the current
          // watermark — Spark requires a future timeout timestamp.
          val due = (if (st2.open) List(st2.endTime + gapNs) else Nil) ++
            still.headOption.map(_.time)
          if (due.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              due.min / 1000000L + 1, state.getCurrentWatermarkMs() + 1))
          (closed ++ flushed).iterator
      }
  }
}
