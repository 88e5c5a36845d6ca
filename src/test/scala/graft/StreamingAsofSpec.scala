package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingAsof
import graft.streaming.StreamingAsof.{SMsg, SOut}

/** Streaming as-of join: dp3 asof semantics held open over an
  * unbounded stream via flatMapGroupsWithState, finalized by the
  * event-time watermark. Must agree with the batch AsofJoin on the
  * same rows.
  */
class StreamingAsofSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val S = 1000000000L // 1 s in ns

  test("streaming as-of equals the batch join after watermark flush") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[SMsg]
    val joined = StreamingAsof.join(spark, mem.toDS(),
      thresholdNs = 0L, immediate = false, lateness = "10 seconds")

    val q = joined.writeStream.format("memory")
      .queryName("asof_out").outputMode("append").start()
    try {
      // left topic t1 (side 0), right topic t8 (side 1)
      mem.addData(
        SMsg("p", "t1", 10 * S, 1L, 1.0, 0),
        SMsg("p", "t8", 20 * S, 2L, 2.0, 1),
        SMsg("p", "t1", 40 * S, 3L, 3.0, 0))
      q.processAllAvailable()
      mem.addData(SMsg("p", "t8", 50 * S, 4L, 4.0, 1))
      q.processAllAvailable()
      // watermark-advancing sentinels (never matched, never emitted)
      mem.addData(SMsg("p", "t1", 200 * S, 9L, 0.0, 0))
      q.processAllAvailable()
      mem.addData(SMsg("p", "t1", 400 * S, 10L, 0.0, 0))
      q.processAllAvailable()

      val got = spark.table("asof_out").as[SOut].collect()
        .map(o => (o.topic, o.time, o.emit_time, o.emit_side)).toSet
      // right@20 matches left@10; left@40 steals right@50; both lefts
      // emit at their OWN time (the merge-node ordering contract)
      assert(got == Set(
        ("t1", 10 * S, 10 * S, 0), ("t8", 20 * S, 20 * S, 1),
        ("t1", 40 * S, 40 * S, 0), ("t8", 50 * S, 50 * S, 1)))

      // cross-check: the batch AsofJoin on the identical rows
      val rows = Seq(
        ("p", "t1", 10 * S, 1L, 1.0, 0), ("p", "t8", 20 * S, 2L, 2.0, 1),
        ("p", "t1", 40 * S, 3L, 3.0, 0), ("p", "t8", 50 * S, 4L, 4.0, 1))
        .toDF("producer", "topic", "time", "seq", "value", "side")
      val batch = graft.ops.AsofJoin.join(
        rows.where(col("side") === 0).drop("side"),
        rows.where(col("side") === 1).drop("side"),
        timeCol = "time", keys = Seq("producer"), thresholdNs = 0L,
        immediate = false, tieCol = Some("seq"))
        .select("topic", "time", "emit_time", "emit_side").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("streaming immediate keeps only the first right; state stays " +
      "bounded by the watermark") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[SMsg]
    val joined = StreamingAsof.join(spark, mem.toDS(),
      thresholdNs = 100 * S, immediate = true, lateness = "5 seconds")
    val q = joined.writeStream.format("memory")
      .queryName("asof_imm").outputMode("append").start()
    try {
      mem.addData(
        SMsg("p", "t1", 10 * S, 1L, 1.0, 0),
        SMsg("p", "t8", 11 * S, 2L, 2.0, 1),
        SMsg("p", "t8", 12 * S, 3L, 3.0, 1))
      q.processAllAvailable()
      mem.addData(SMsg("p", "t1", 300 * S, 8L, 0.0, 0))
      q.processAllAvailable()
      mem.addData(SMsg("p", "t1", 600 * S, 9L, 0.0, 0))
      q.processAllAvailable()
      val got = spark.table("asof_imm").as[SOut].collect()
        .map(o => (o.topic, o.time)).toSet
      assert(got == Set(("t1", 10 * S), ("t8", 11 * S)))
    } finally q.stop()
  }
}
