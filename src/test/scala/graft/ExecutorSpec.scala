package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.DataFrameCatalog
import graft.plan.Planner

/** End-to-end QL → rows tests — a port of the reference's executor e2e
  * case table (reference: server/executor/executor_test.go:21-241).
  * Expectations are the reference's own (topic, log_time) sequences.
  */
class ExecutorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val planner = new Planner(new DataFrameCatalog(
    TestSpark.prepFixture()))

  private def run(q: String): Seq[(String, Long)] =
    planner.plan(spark, q).select("topic", "time").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  // --- join scenarios (executor_test.go:29-121) -------------------------

  test("basic scan") {
    assert(run("from device t0;") ==
      Seq("t0" -> 0L, "t0" -> 1L, "t0" -> 2L, "t0" -> 3L, "t0" -> 4L))
  }

  test("scan matching no data") {
    assert(run("from device t0 where t0.u8 = 100;").isEmpty)
  }

  test("basic descending scan") {
    assert(run("from device t0 desc;") ==
      Seq("t0" -> 4L, "t0" -> 3L, "t0" -> 2L, "t0" -> 1L, "t0" -> 0L))
  }

  test("basic merge join") {
    assert(run("from device t0, t1;") == Seq(
      "t0" -> 0L, "t1" -> 0L, "t0" -> 1L, "t0" -> 2L, "t1" -> 2L,
      "t0" -> 3L, "t0" -> 4L, "t1" -> 4L, "t1" -> 6L, "t1" -> 8L))
  }

  test("merge join with where clause on one element") {
    assert(run("from device t0, t1 where t1.u8 = 0;") == Seq(
      "t0" -> 0L, "t1" -> 0L, "t0" -> 1L, "t0" -> 2L, "t0" -> 3L,
      "t0" -> 4L))
  }

  test("merge join with where clause on both elements") {
    assert(run("from device t0, t1 where t0.u8 = 0 or t1.u8 = 0;") ==
      Seq("t0" -> 0L, "t1" -> 0L))
  }

  test("asof join precedes") {
    assert(run("from device t0 precedes t1 by less than 2 nanoseconds;")
      == Seq("t0" -> 0L, "t1" -> 0L, "t0" -> 2L, "t1" -> 2L,
        "t0" -> 4L, "t1" -> 4L))
  }

  test("asof join succeeds") {
    assert(run("from device t0 succeeds t1 by less than 2 nanoseconds;")
      == Seq("t1" -> 0L, "t0" -> 0L, "t0" -> 1L, "t1" -> 2L,
        "t0" -> 2L, "t0" -> 3L, "t1" -> 4L, "t0" -> 4L))
  }

  test("asof join precedes without immediate") {
    assert(run("from device t1 precedes t8 by less than 100 nanoseconds;")
      == Seq("t1" -> 0L, "t8" -> 0L, "t1" -> 8L, "t8" -> 9L,
        "t8" -> 18L, "t8" -> 27L, "t8" -> 36L))
  }

  test("asof join precedes with immediate") {
    assert(run(
      "from device t1 precedes immediate t8 by less than 100 nanoseconds;")
      == Seq("t1" -> 0L, "t8" -> 0L, "t1" -> 8L, "t8" -> 9L))
  }

  test("asof join with where clause") {
    assert(run("from device t0 precedes immediate t1 by less than " +
      "10 nanoseconds where t0.u8 = 0;") == Seq("t0" -> 0L, "t1" -> 0L))
  }

  test("merge join with alias") {
    assert(run("from device t0 as a, t1 as b where a.u8 = 0 or b.u8 = 0;")
      == Seq("t0" -> 0L, "t1" -> 0L))
  }

  test("merge join one alias one not") {
    assert(run("from device t0 as a, t1 where a.u8 = 0 or t1.u8 = 0;")
      == Seq("t0" -> 0L, "t1" -> 0L))
  }

  test("asof join with alias") {
    assert(run("from device t0 as a precedes t1 as b by less than " +
      "10 nanoseconds where a.u8 = 0 or b.u8 = 0;")
      == Seq("t0" -> 0L, "t1" -> 0L))
  }

  test("limit") {
    assert(run("from device t0 as a precedes t1 as b by less than " +
      "10 nanoseconds where a.u8 = 0 or b.u8 = 0 limit 1;")
      == Seq("t0" -> 0L))
  }

  test("offset") {
    assert(run("from device t0 as a precedes t1 as b by less than " +
      "10 nanoseconds where a.u8 = 0 or b.u8 = 0 offset 1;")
      == Seq("t1" -> 0L))
  }

  test("asof join as a merge child interleaves lefts at their own time") {
    // The merge orders every tuple by its OWN log time (reference:
    // server/executor/merge_node.go:46-54): the matched left t0@4 sits
    // at t=4 among the sibling t1 rows, NOT at its first matching
    // right's time (t8@9). t0 precedes t8: rights t8@{0,9,18,27,36}
    // match lefts t0@0 and t0@4; sibling t1 at {0,2,4,6,8}.
    assert(run("from device t1, t0 precedes t8 by less than " +
      "100 nanoseconds;") == Seq(
      "t1" -> 0L, "t0" -> 0L, "t8" -> 0L, "t1" -> 2L, "t1" -> 4L,
      "t0" -> 4L, "t1" -> 6L, "t1" -> 8L, "t8" -> 9L, "t8" -> 18L,
      "t8" -> 27L, "t8" -> 36L))
    // limit returns different ROWS, not just a different order: row 6
    // must be the left t0@4 (own time), not t1@6 (the result under
    // first-right-time emission)
    assert(run("from device t1, t0 precedes t8 by less than " +
      "100 nanoseconds limit 6;") == Seq(
      "t1" -> 0L, "t0" -> 0L, "t8" -> 0L, "t1" -> 2L, "t1" -> 4L,
      "t0" -> 4L))
  }

  test("neighbors joins pick the nearest left on either side " +
      "(extension: the reference errors here)") {
    // t8 lefts at 0,9,18,27,36; t1 rights at 0,2,4,6,8.
    // r=0 -> same-time left 0 (d0); r=2 -> prev 0 (d2 vs next d7);
    // r=4 -> prev 0 at d4, NOT < 4 -> dropped; r=6 -> NEXT left 9
    // (d3 beats prev d6) — the case precedes/succeeds cannot express;
    // r=8 -> next left 9 (d1). Lefts emit once at their own time.
    assert(run("from device t8 neighbors t1 by less than 4 nanoseconds;")
      == Seq("t8" -> 0L, "t1" -> 0L, "t1" -> 2L, "t1" -> 6L,
        "t1" -> 8L, "t8" -> 9L))
  }

  test("neighbors immediate keeps only the NEAREST right per left") {
    // left 0's rights by distance: 0 (d0), 2 (d2) -> keep r=0;
    // left 9's: 8 (d1), 6 (d3) -> keep r=8
    assert(run("from device t8 neighbors immediate t1 " +
      "by less than 4 nanoseconds;")
      == Seq("t8" -> 0L, "t1" -> 0L, "t1" -> 8L, "t8" -> 9L))
  }

  test("neighbors as a merge child interleaves at own log time, " +
      "including rights that precede their matched left") {
    // same matches as the standalone case (lefts t8@{0,9}, rights
    // t1@{0,2,6,8}); sibling t0 at {0,1,2,3,4} interleaves by own
    // time with child index breaking equal-time ties — t1@6 and t1@8
    // sort BEFORE their matched left t8@9, which own-time emission
    // handles and first-right-time emission would not
    assert(run("from device t0, t8 neighbors t1 by less than " +
      "4 nanoseconds;") == Seq(
      "t0" -> 0L, "t8" -> 0L, "t1" -> 0L, "t0" -> 1L, "t0" -> 2L,
      "t1" -> 2L, "t0" -> 3L, "t0" -> 4L, "t1" -> 6L, "t1" -> 8L,
      "t8" -> 9L))
  }

  test("neighbors threshold zero is unbounded") {
    // every t1 right matches its nearest t8 left: 0,2,4 -> left 0
    // (r=4: prev d4 beats next d5); 6,8 -> left 9
    assert(run("from device t8 neighbors t1;")
      == Seq("t8" -> 0L, "t1" -> 0L, "t1" -> 2L, "t1" -> 4L,
        "t1" -> 6L, "t1" -> 8L, "t8" -> 9L))
  }

  test("asof threshold zero is unbounded") {
    // t1 precedes t8 with no constraint: every t8 matches the latest t1
    assert(run("from device t1 precedes t8;") ==
      Seq("t1" -> 0L, "t8" -> 0L, "t1" -> 8L, "t8" -> 9L,
        "t8" -> 18L, "t8" -> 27L, "t8" -> 36L))
  }

  // --- string comparisons (executor_test.go:149-178) --------------------

  private val stringCases: Seq[(String, Int)] = Seq(
    ("= 'hello'", 5), ("< 'hello'", 0), ("> 'hello'", 0),
    ("<= 'hello'", 5), (">= 'hello'", 5), ("!= 'hello'", 0),
    ("~ 'ello'", 5), ("~ '^ello'", 0), ("~ '^hello$'", 5),
    ("~* 'HeLLo'", 5))

  stringCases.foreach { case (cond, n) =>
    test(s"string comparison: s $cond") {
      assert(run(s"from device t0 where t0.s $cond;").size == n)
    }
  }

  // the `~` lowercasing quirk: uppercase pattern still matches via `~`
  test("regex ~ is case-insensitive like the reference") {
    assert(run("from device t0 where t0.s ~ 'HELLO';").size == 5)
  }

  // --- numeric comparisons: 6 ops x 10 types (executor_test.go:181-241) -

  private val fields = Seq("u8", "u16", "u32", "u64", "i8", "i16", "i32",
    "i64", "f32", "f64")
  private val expected: Map[String, Seq[Long]] = Map(
    "=" -> Seq(1L), "<" -> Seq(0L), ">" -> Seq(2L, 3L, 4L),
    "<=" -> Seq(0L, 1L), ">=" -> Seq(1L, 2L, 3L, 4L),
    "!=" -> Seq(0L, 2L, 3L, 4L))

  for (f <- fields; op <- expected.keys.toSeq.sorted) {
    test(s"numeric comparison: $f $op 1") {
      assert(run(s"from device t0 where t0.$f $op 1;").map(_._2) ==
        expected(op))
    }
  }
}
