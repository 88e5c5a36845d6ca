package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sessionize

/** Gap-based sessionization semantics + the one-shuffle plan claim. */
class SessionizeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    // key a: events at 0, 5, 7, 100, 103 with gap 10 → sessions
    // {0,5,7} and {100,103}
    ("a", 0L, 1L), ("a", 5L, 2L), ("a", 7L, 3L),
    ("a", 100L, 4L), ("a", 103L, 5L),
    // key b: single event
    ("b", 50L, 6L)
  ).toDF("k", "t", "seq")

  test("sessions split at gaps, ids are per-key and 1-based") {
    val got = Sessionize.assign(fixture, Seq("k"), "t", gap = 10L,
      tieCols = Seq("seq"))
      .select("k", "t", "session_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("a", 0L, 1L), ("a", 5L, 1L), ("a", 7L, 1L),
      ("a", 100L, 2L), ("a", 103L, 2L),
      ("b", 50L, 1L)))
  }

  test("a gap of exactly `gap` stays in the session") {
    val df = Seq(("a", 0L, 1L), ("a", 10L, 2L), ("a", 21L, 3L))
      .toDF("k", "t", "seq")
    val ids = Sessionize.assign(df, Seq("k"), "t", gap = 10L,
      tieCols = Seq("seq"))
      .orderBy("t").collect().map(_.getAs[Long]("session_id")).toSeq
    assert(ids == Seq(1L, 1L, 2L)) // 0→10 = gap stays; 10→21 > gap splits
  }

  test("summarize: per-session bounds and counts") {
    val got = Sessionize.summarize(fixture, Seq("k"), "t", gap = 10L,
      tieCols = Seq("seq"))
      .orderBy("k", "session_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("a", 1L, 3L, 0L, 7L),
      ("a", 2L, 2L, 100L, 103L),
      ("b", 1L, 1L, 50L, 50L)))
  }

  test("lag and running sum share one exchange and one sort") {
    val plan = Sessionize.assign(fixture, Seq("k"), "t", gap = 10L,
      tieCols = Seq("seq")).queryExecution.executedPlan.toString
    def countOf(needle: String) =
      plan.sliding(needle.length).count(_ == needle)
    assert(countOf("Exchange hashpartitioning") == 1, plan)
    // both window functions evaluate over the same sorted stream
    assert(countOf("Sort ") == 1, plan)
  }
}
