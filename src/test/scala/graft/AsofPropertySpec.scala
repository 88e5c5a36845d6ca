package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.ops.AsofJoin

/** Property check: the windowed distributed AsofJoin equals an
  * independent sequential automaton implementing the reference
  * semantics verbatim (server/executor/asof_node.go:64-111) on random
  * dense streams — collisions in time, interleaved sides, both
  * immediate modes, bounded and unbounded thresholds. The window
  * formulation is the operator's scale mechanism; this pins it to the
  * executable spec it must never drift from. Seeded generation keeps
  * every run reproducible.
  */
class AsofPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** one stream row: (time, side 0|1, unique seq) */
  private case class R(time: Long, side: Int, seq: Long)

  /** The reference automaton, written directly from the prose rules:
    * process rows in (time, side, seq) order; a left becomes the
    * current left (unemitted); a right matching the current left
    * within threshold emits the left once (at the LEFT'S own time)
    * then the right, unless immediate has already consumed the left.
    * Output: (seq, emit_time, emit_side). */
  private def sequential(rows: Seq[R], thresholdNs: Long,
      immediate: Boolean): Seq[(Long, Long, Int)] = {
    var lastLeft: Option[R] = None
    var emitted = false
    val out = Seq.newBuilder[(Long, Long, Int)]
    rows.sortBy(r => (r.time, r.side, r.seq)).foreach { r =>
      if (r.side == 0) { lastLeft = Some(r); emitted = false }
      else lastLeft.foreach { l =>
        val inRange = thresholdNs == 0L || r.time < l.time + thresholdNs
        if (inRange && !(immediate && emitted)) {
          if (!emitted) { out += ((l.seq, l.time, 0)); emitted = true }
          out += ((r.seq, r.time, 1))
        }
      }
    }
    out.result()
  }

  private val genRows: Gen[List[R]] = for {
    n <- Gen.choose(2, 14)
    rows <- Gen.listOfN(n, for {
      t <- Gen.choose(0L, 9L) // dense: time collisions guaranteed
      s <- Gen.oneOf(0, 1)
    } yield (t, s))
  } yield rows.zipWithIndex.map { case ((t, s), i) => R(t, s, i.toLong) }

  /** Sequential spec for the `neighbors` extension: each right picks
    * the nearest left in time on either side (prev = last left
    * at-or-before in (time, side, seq) merge order, so a same-time
    * left has distance 0 and always wins; distance ties pick the
    * earlier/prev left), matches iff distance < threshold
    * (0 = unbounded). Each matched left emits once at its own time;
    * rights emit at theirs, nearest-first defining `immediate`
    * (distance ties: earlier right). */
  private def sequentialNeighbors(rows: Seq[R], thresholdNs: Long,
      immediate: Boolean): Seq[(Long, Long, Int)] = {
    val lefts = rows.filter(_.side == 0).sortBy(r => (r.time, r.seq))
    val rights = rows.filter(_.side == 1).sortBy(r => (r.time, r.seq))
    def nearest(r: R): Option[R] = {
      val prev = lefts.filter(_.time <= r.time).lastOption
      val next = lefts.find(_.time > r.time)
      val pick = (prev, next) match {
        case (Some(p), Some(n)) =>
          if (r.time - p.time <= n.time - r.time) Some(p) else Some(n)
        case (p, n) => p.orElse(n)
      }
      pick.filter(l =>
        thresholdNs == 0L || math.abs(r.time - l.time) < thresholdNs)
    }
    val out = Seq.newBuilder[(Long, Long, Int)]
    rights.flatMap(r => nearest(r).map(_ -> r))
      .groupBy(_._1).toSeq.sortBy(g => (g._1.time, g._1.seq))
      .foreach { case (l, pairs) =>
        val ordered = pairs.map(_._2)
          .sortBy(r => (math.abs(r.time - l.time), r.time, r.seq))
        out += ((l.seq, l.time, 0))
        (if (immediate) ordered.take(1) else ordered)
          .foreach(r => out += ((r.seq, r.time, 1)))
      }
    out.result()
  }

  test("neighbors equals its sequential spec on random dense streams") {
    import spark.implicits._
    val params = Gen.Parameters.default
    var seed = Seed(20260816L)
    var checked = 0
    while (checked < 40) {
      val rows = genRows.pureApply(params, seed)
      seed = seed.next
      val hasBoth = rows.exists(_.side == 0) && rows.exists(_.side == 1)
      if (hasBoth) {
        checked += 1
        val threshold = if (checked % 2 == 0) 0L else 3L
        val immediate = checked % 4 < 2
        val df = rows.map(r => ("p", r.time, r.seq, r.side))
          .toDF("producer", "time", "seq", "side")
        val got = AsofJoin.neighbors(
          df.where(col("side") === 0).drop("side"),
          df.where(col("side") === 1).drop("side"),
          timeCol = "time", keys = Seq("producer"),
          thresholdNs = threshold, immediate = immediate,
          tieCol = Some("seq"))
          .select("seq", "emit_time", "emit_side")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .sortBy(t => (t._2, t._3, t._1)).toSeq
        val want = sequentialNeighbors(rows, threshold, immediate)
          .sortBy(t => (t._2, t._3, t._1))
        assert(got == want,
          s"case $checked: rows=$rows thr=$threshold imm=$immediate")
      }
    }
  }

  test("neighbors plans ONE hash exchange: the forward next-left " +
      "frame merges into the backward pass's Window, and the " +
      "group-local row_number rides the same partitioning") {
    import spark.implicits._
    val df = (0 until 50).map(i => ("p", i.toLong, i.toLong, i % 2))
      .toDF("producer", "time", "seq", "side")
    val p = AsofJoin.neighbors(
        df.where(col("side") === 0).drop("side"),
        df.where(col("side") === 1).drop("side"),
        timeCol = "time", keys = Seq("producer"),
        thresholdNs = 3L, immediate = false, tieCol = Some("seq"))
      .queryExecution.executedPlan.toString
    // pre-run executedPlan prints the single initial tree (the
    // exchange-count gate rule) — hashpartitioning(producer) appears
    // once; the second Window's (producer, _grp) clustering is
    // satisfied by it (extra local Sort, no new shuffle)
    assert(p.linesIterator
      .count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("windowed as-of equals the sequential reference automaton") {
    import spark.implicits._
    val params = Gen.Parameters.default
    var seed = Seed(20260812L)
    var checked = 0
    while (checked < 40) {
      val rows = genRows.pureApply(params, seed)
      seed = seed.next
      val hasBoth = rows.exists(_.side == 0) && rows.exists(_.side == 1)
      if (hasBoth) {
        checked += 1
        val threshold = if (checked % 2 == 0) 0L else 3L
        val immediate = checked % 4 < 2
        val df = rows.map(r => ("p", r.time, r.seq, r.side))
          .toDF("producer", "time", "seq", "side")
        val got = AsofJoin.join(
          df.where(col("side") === 0).drop("side"),
          df.where(col("side") === 1).drop("side"),
          timeCol = "time", keys = Seq("producer"),
          thresholdNs = threshold, immediate = immediate,
          tieCol = Some("seq"))
          .select("seq", "emit_time", "emit_side")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .sortBy(t => (t._2, t._3, t._1)).toSeq
        val want = sequential(rows, threshold, immediate)
          .sortBy(t => (t._2, t._3, t._1))
        assert(got == want,
          s"case $checked: rows=$rows thr=$threshold imm=$immediate")
      }
    }
  }
}
