package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IntervalJoin

/** Bucketized interval joins: containment/overlap semantics (closed
  * bounds), the arithmetic pair-dedup, the runaway guards, and the
  * equi-join plan shape. */
class IntervalJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def points = Seq(
    ("a", 5L, 1L), ("a", 10L, 2L), ("a", 25L, 3L), ("a", 99L, 4L),
    ("b", 10L, 5L)
  ).toDF("k", "t", "pid")

  private def intervals = Seq(
    ("a", 10L, 30L, 100L), // catches 10 (closed start) and 25
    ("a", 90L, 120L, 101L), // catches 99
    ("b", 0L, 9L, 102L)     // catches nothing (10 > 9)
  ).toDF("k", "s", "e", "iid")

  test("point-in-interval: closed bounds, per-key, exactly once") {
    val got = IntervalJoin.pointInInterval(points, intervals,
      Seq("k"), "t", "s", "e", bucketWidth = 8L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq((2L, 100L), (3L, 100L), (4L, 101L)))
  }

  test("a point inside two nested intervals matches both") {
    val nested = Seq(("a", 0L, 100L, 1L), ("a", 20L, 30L, 2L))
      .toDF("k", "s", "e", "iid")
    val one = Seq(("a", 25L, 9L)).toDF("k", "t", "pid")
    val got = IntervalJoin.pointInInterval(one, nested, Seq("k"),
      "t", "s", "e", bucketWidth = 7L)
      .select("iid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("overlaps: closed-bound intersection, deduped arithmetically") {
    val l = Seq(("a", 0L, 50L, 1L), ("a", 60L, 70L, 2L))
      .toDF("k", "ls", "le", "lid")
    val r = Seq(("a", 40L, 65L, 10L), ("a", 71L, 80L, 11L),
      ("a", 50L, 50L, 12L)).toDF("k", "rs", "re", "rid")
    // small buckets force multi-bucket sharing: the dedup must hold
    val got = IntervalJoin.overlaps(l, r, Seq("k"),
      "ls", "le", "rs", "re", bucketWidth = 3L)
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    // pairs: l1 x r10 (40..50), l1 x r12 (point 50), l2 x r10 (60..65);
    // l2 x r11 do NOT overlap (70 < 71)
    assert(got.sorted == Seq((1L, 10L), (1L, 12L), (2L, 10L)))
    assert(got.distinct.size == got.size, "pair emitted more than once")
  }

  test("guards: end < start and over-wide intervals throw in the job") {
    val bad = Seq(("a", 30L, 10L, 1L)).toDF("k", "s", "e", "iid")
    val ex = intercept[Exception] {
      IntervalJoin.pointInInterval(points, bad, Seq("k"),
        "t", "s", "e", bucketWidth = 8L).count()
    }
    assert(ex.getMessage.contains("end < start")
      || ex.getCause != null)
    val wide = Seq(("a", 0L, 1000000L, 1L)).toDF("k", "s", "e", "iid")
    val ex2 = intercept[Exception] {
      IntervalJoin.pointInInterval(points, wide, Seq("k"),
        "t", "s", "e", bucketWidth = 1L, maxBucketsPerInterval = 16)
        .count()
    }
    assert(ex2.getMessage.contains("buckets")
      || ex2.getCause != null)
  }

  test("the join is an equi-join on (key, bucket) — never a " +
      "nested loop or cartesian") {
    val plan = IntervalJoin.pointInInterval(points, intervals,
      Seq("k"), "t", "s", "e", bucketWidth = 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"), plan)
  }

  test("events joined to their own sessions recover the session " +
      "counts exactly") {
    val m = new graft.model.EventsCatalog("/root/testdata/sf0.001")
      .messages(spark)
      .select("producer", "topic", "time_us", "seq")
    val day = 86400L * 1000000L
    val sess = graft.ops.Sessionize.summarize(m,
      Seq("producer", "topic"), "time_us", day, Seq("seq"))
    val counted = IntervalJoin.pointInInterval(m,
      sess.withColumnRenamed("n_events", "expected"),
      Seq("producer", "topic"), "time_us", "start_time", "end_time",
      bucketWidth = day)
      .groupBy("producer", "topic", "session_id", "expected")
      .agg(count(lit(1)).as("got"))
    assert(counted.where(col("got") =!= col("expected")).count() == 0)
    assert(counted.count() == sess.count())
  }
}
