package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** dp3 as-of semantics over UNBOUNDED streams — the streaming analogue
  * of the reference's tail/live queries (the reference emulates tailing
  * by re-polling /export with last-seen versions,
  * server/cli/cmd/tail.go:51-82; Structured Streaming holds the join
  * state instead and emits matches continuously).
  *
  * Semantics are identical to the batch [[graft.ops.AsofJoin]]
  * (reference: server/executor/asof_node.go:64-111): each right matches
  * the most recent left at-or-before it within `thresholdNs` (0 =
  * unbounded); a matched left emits once at its OWN time immediately
  * before its first matching right; `immediate` keeps only the first
  * right; unmatched rows on either side drop; a newer left steals
  * subsequent rights.
  *
  * Mechanism: `flatMapGroupsWithState` keyed by producer. Each
  * micro-batch appends the group's new rows to a small per-key buffer;
  * rows at or below the CURRENT EVENT-TIME WATERMARK are finalized —
  * sorted by (time, side, seq) and run through the sequential dp3
  * automaton — while rows above it stay buffered (a late left could
  * still arrive and steal them). State per key is the pending buffer +
  * the last finalized left: O(rows inside the watermark lateness
  * horizon), NOT O(stream) — the watermark is what bounds state, same
  * discipline as [[Ingest.dedupe]].
  *
  * Scale shape: one `groupByKey(producer)` shuffle; per-key state and
  * per-key sequential finalization, fully parallel across producers —
  * the same partitioning the batch as-of uses, held open over time.
  */
object StreamingAsof {

  /** canonical streaming message: `side` 0 = left topic, 1 = right */
  case class SMsg(producer: String, topic: String, time: Long,
      seq: Long, value: Double, side: Int)

  /** match output: the row plus its dp3 stream position */
  case class SOut(producer: String, topic: String, time: Long,
      seq: Long, value: Double, emit_time: Long, emit_side: Int)

  /** per-producer automaton state across micro-batches */
  case class AsofState(lastLeft: Option[SMsg], lastLeftEmitted: Boolean,
      pending: List[SMsg])

  /** Run the dp3 automaton over time-ordered, watermark-finalized rows.
    * Returns (outputs, final lastLeft, final emitted flag). */
  private def advance(rows: Seq[SMsg], lastLeft0: Option[SMsg],
      emitted0: Boolean, thresholdNs: Long, immediate: Boolean)
      : (List[SOut], Option[SMsg], Boolean) = {
    var lastLeft = lastLeft0
    var emitted = emitted0
    val out = List.newBuilder[SOut]
    rows.foreach { m =>
      if (m.side == 0) { lastLeft = Some(m); emitted = false }
      else lastLeft.foreach { l =>
        val inRange = thresholdNs == 0L || m.time < l.time + thresholdNs
        if (inRange && !(immediate && emitted)) {
          if (!emitted) {
            out += SOut(l.producer, l.topic, l.time, l.seq, l.value,
              emit_time = l.time, emit_side = 0)
            emitted = true
          }
          out += SOut(m.producer, m.topic, m.time, m.seq, m.value,
            emit_time = m.time, emit_side = 1)
        }
      }
    }
    (out.result(), lastLeft, emitted)
  }

  /** watermark carrier: the event-time column must survive into the
    * stateful operator, so the message rides next to it */
  case class WMsg(m: SMsg, ts: java.sql.Timestamp)

  /** `lateness` is the out-of-orderness horizon: it bounds both state
    * size and emission delay (rows finalize once the watermark passes
    * them). Returns the append-mode stream of matches. */
  def join(spark: SparkSession, stream: Dataset[SMsg],
      thresholdNs: Long, immediate: Boolean,
      lateness: String = "10 seconds"): Dataset[SOut] = {
    import spark.implicits._
    val watermarked = stream
      .withColumn("ts", timestamp_micros(expr("time div 1000")))
      .withWatermark("ts", lateness)
      .select(struct(col("producer"), col("topic"), col("time"),
        col("seq"), col("value"), col("side")).as("m"), col("ts"))
      .as[WMsg]
    watermarked.groupByKey(_.m.producer)
      .flatMapGroupsWithState[AsofState, SOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (producer: String, it: Iterator[WMsg],
            state: GroupState[AsofState]) =>
          val st = state.getOption
            .getOrElse(AsofState(None, lastLeftEmitted = false, Nil))
          val wmNs = state.getCurrentWatermarkMs() * 1000000L
          val all = (st.pending ++ it.map(_.m))
            .sortBy(m => (m.time, m.side, m.seq))
          // finalize only rows the watermark guarantees complete;
          // later batches cannot insert earlier rows below it
          val (ripe, still) = all.partition(_.time <= wmNs)
          val (out, lastLeft, emitted) = advance(ripe, st.lastLeft,
            st.lastLeftEmitted, thresholdNs, immediate)
          state.update(AsofState(lastLeft, emitted, still))
          out.iterator
      }
  }
}
