package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Sessionize
import graft.streaming.StreamingSessionize
import graft.streaming.StreamingSessionize.{SEvent, Session}

/** Streaming sessionization: closed sessions over an unbounded stream
  * must agree with the batch Sessionize on the same rows, and state
  * must stay bounded by the watermark.
  */
class StreamingSessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val S = 1000000000L // 1 s in ns

  test("streaming sessions equal batch sessions once closed") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[SEvent]
    val out = StreamingSessionize.sessions(spark, mem.toDS(),
      gapNs = 30 * S, lateness = "5 seconds")
    val q = out.writeStream.format("memory")
      .queryName("sess_out").outputMode("append").start()
    try {
      // key a: {10,20,35} then gap > 30s then {100}; key b: {50}
      mem.addData(
        SEvent("a", 10 * S, 1L), SEvent("a", 20 * S, 2L),
        SEvent("a", 35 * S, 3L), SEvent("b", 50 * S, 4L))
      q.processAllAvailable()
      mem.addData(SEvent("a", 100 * S, 5L))
      q.processAllAvailable()
      // watermark far past everything: all sessions close
      mem.addData(SEvent("a", 500 * S, 9L), SEvent("b", 500 * S, 10L))
      q.processAllAvailable()
      mem.addData(SEvent("a", 900 * S, 11L), SEvent("b", 900 * S, 12L))
      q.processAllAvailable()

      val got = spark.table("sess_out").as[Session].collect()
        .map(s => (s.key, s.session_id, s.n_events, s.start_time,
          s.end_time)).toSet
      // sentinel rows at 500/900 may have closed too — restrict to the
      // sessions below them and compare against the batch operator
      val gotBelow = got.filter(_._4 < 400 * S)
      val batch = Sessionize.summarize(
        Seq(("a", 10 * S, 1L), ("a", 20 * S, 2L), ("a", 35 * S, 3L),
          ("b", 50 * S, 4L), ("a", 100 * S, 5L))
          .toDF("key", "time", "seq"),
        Seq("key"), "time", gap = 30 * S, tieCols = Seq("seq"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(gotBelow == batch)
      // the session split happened where the gap says (35 -> 100 > 30)
      assert(gotBelow.contains(("a", 1L, 3L, 10 * S, 35 * S)))
      assert(gotBelow.contains(("a", 2L, 1L, 100 * S, 100 * S)))
      assert(gotBelow.contains(("b", 1L, 1L, 50 * S, 50 * S)))
    } finally q.stop()
  }

  test("late events within lateness extend the right session; state " +
      "is the open session plus the horizon buffer") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[SEvent]
    val out = StreamingSessionize.sessions(spark, mem.toDS(),
      gapNs = 30 * S, lateness = "60 seconds")
    val q = out.writeStream.format("memory")
      .queryName("sess_late").outputMode("append").start()
    try {
      mem.addData(SEvent("a", 10 * S, 1L), SEvent("a", 60 * S, 2L))
      q.processAllAvailable()
      // 25s arrives AFTER 60s but within the 60s lateness horizon —
      // it must land in session 1 (10..25), not open its own
      mem.addData(SEvent("a", 25 * S, 3L))
      q.processAllAvailable()
      mem.addData(SEvent("a", 400 * S, 8L))
      q.processAllAvailable()
      mem.addData(SEvent("a", 800 * S, 9L))
      q.processAllAvailable()

      val got = spark.table("sess_late").as[Session].collect()
        .filter(_.start_time < 300 * S)
        .map(s => (s.session_id, s.n_events, s.start_time, s.end_time))
        .toSet
      // 10,25 merge (gap 15 <= 30) then 60 continues (gap 35 > 30 →
      // split): sessions {10,25} and {60}
      assert(got == Set((1L, 2L, 10 * S, 25 * S),
        (2L, 1L, 60 * S, 60 * S)))
    } finally q.stop()
  }

  test("rows beyond the lateness horizon are dropped, not allowed to " +
      "corrupt finalized session bounds") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[SEvent]
    val out = StreamingSessionize.sessions(spark, mem.toDS(),
      gapNs = 30 * S, lateness = "5 seconds")
    val q = out.writeStream.format("memory")
      .queryName("sess_drop").outputMode("append").start()
    try {
      mem.addData(SEvent("a", 10 * S, 1L), SEvent("a", 20 * S, 2L),
        SEvent("a", 35 * S, 3L))
      q.processAllAvailable()
      mem.addData(SEvent("a", 500 * S, 4L)) // watermark moves to 495s
      q.processAllAvailable()
      // 15s is 480s beyond the 5s horizon: watermark semantics say
      // drop. Without the drop it would re-enter the ripe set, join
      // session 1, inflate its count, and (pre-clamp) regress its
      // end_time to 15 — corrupting the later gap decision too.
      mem.addData(SEvent("a", 15 * S, 5L))
      q.processAllAvailable()
      mem.addData(SEvent("a", 900 * S, 6L))
      q.processAllAvailable()

      // session 1 must close with its true bounds — 3 events ending at
      // 35s; the dropped row must neither inflate the count (4) nor
      // regress the end (15)
      val got = spark.table("sess_drop").as[Session].collect()
        .filter(_.start_time < 400 * S)
        .map(s => (s.session_id, s.n_events, s.start_time, s.end_time))
        .toSet
      assert(got == Set((1L, 3L, 10 * S, 35 * S)))
    } finally q.stop()
  }

  test("a key that goes silent still flushes its last session via the " +
      "event-time timeout") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[SEvent]
    val out = StreamingSessionize.sessions(spark, mem.toDS(),
      gapNs = 30 * S, lateness = "5 seconds")
    val q = out.writeStream.format("memory")
      .queryName("sess_idle").outputMode("append").start()
    try {
      mem.addData(SEvent("a", 10 * S, 1L), SEvent("a", 20 * S, 2L))
      q.processAllAvailable()
      // only OTHER keys advance the watermark from here on: key a must
      // still emit its session (NoTimeout never re-invoked silent keys)
      mem.addData(SEvent("b", 500 * S, 3L))
      q.processAllAvailable()
      mem.addData(SEvent("b", 900 * S, 4L))
      q.processAllAvailable()

      val aSessions = spark.table("sess_idle").as[Session].collect()
        .filter(_.key == "a")
        .map(s => (s.session_id, s.n_events, s.start_time, s.end_time))
        .toSet
      assert(aSessions == Set((1L, 2L, 10 * S, 20 * S)))
    } finally q.stop()
  }
}
