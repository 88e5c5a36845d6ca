package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** dp3-semantics as-of join, composed from Spark built-ins.
  *
  * Semantics (reference: server/executor/asof_node.go:13-21,64-111):
  * inputs are merged in time order (ties: left before right); each RIGHT
  * row matches the most recent LEFT row at-or-before it; the match
  * stands iff `right.time < left.time + thresholdNs` (threshold 0 =
  * unbounded). A matched left is emitted once, immediately before its
  * first matching right; every matching right is emitted unless
  * `immediate`, which keeps only the first. Unmatched rows on either
  * side are dropped. A newer left "steals" subsequent rights from an
  * older one, even when the older left is still in range.
  *
  * Implementation: tag both sides, single window pass over
  * (keys, time, side) computing a running left-counter and
  * last-seen-left struct — one shuffle on `keys`, no self-join, no
  * driver materialization. With `keys` (e.g. producer) the sort is
  * per-key and fully parallel; with no keys this is a global total
  * order, which is what the semantics demand (dp3 executes that case
  * single-streamed too — reference: server/executor/executor.go:37-96).
  * At 100 TB, always pass keys: the window becomes a per-key
  * sort-within-partitions after one hash exchange.
  *
  * Output = matched lefts ∪ matched rights with three extra columns:
  * `emit_time` (the row's OWN log time — the key the reference's
  * MergeNode orders by, merge_node.go:46-54; sorting by
  * (emit_time, emit_side) reproduces dp3's exact stream both
  * standalone and as a merge child), `emit_side` (0=left, 1=right),
  * and the data columns union-by-name (missing columns null-filled
  * when the two sides' schemas differ).
  */
object AsofJoin {

  def join(
      left: DataFrame,
      right: DataFrame,
      timeCol: String,
      keys: Seq[String],
      thresholdNs: Long,
      immediate: Boolean,
      /** deterministic intra-time tiebreak column, e.g. "seq" */
      tieCol: Option[String] = None
  ): DataFrame = {
    val lStruct = struct(left.columns.map(left(_)): _*)
    val rStruct = struct(right.columns.map(right(_)): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val l2 = left.select((keys.map(left(_)) :+ left(timeCol).as("_t")
      :+ lit(0).as("_side")
      :+ tieCol.map(left(_)).getOrElse(lit(0L)).as("_tie")
      :+ lStruct.as("_lrow")
      :+ lit(null).cast(rType).as("_rrow")): _*)
    val r2 = right.select((keys.map(right(_)) :+ right(timeCol).as("_t")
      :+ lit(1).as("_side")
      :+ tieCol.map(right(_)).getOrElse(lit(0L)).as("_tie")
      :+ lit(null).cast(lType).as("_lrow")
      :+ rStruct.as("_rrow")): _*)
    val u = l2.unionByName(r2)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val annotated = u
      .withColumn("_leftSeq",
        sum(when(col("_side") === 0, 1L).otherwise(0L)).over(w))
      .withColumn("_lastLeft", last(col("_lrow"), ignoreNulls = true).over(w))

    val inRange =
      if (thresholdNs == 0L) lit(true)
      else col("_t") < col("_lastLeft").getField(timeCol) + lit(thresholdNs)

    val matchedRights = annotated
      .where(col("_side") === 1 && col("_leftSeq") > 0
        && col("_lastLeft").isNotNull && inRange)

    // One row per matched left, emitted at the LEFT'S OWN time. The
    // reference's asof node hands the left to its parent immediately
    // before its first matching right (asof_node.go:86-90), and the
    // parent MergeNode orders every tuple by its own log time
    // (merge_node.go:46-54). The two agree inside a single asof stream
    // — a right matched to left L1 is always strictly before the next
    // matched left L2, else L2 would have stolen it — so own-time
    // emission reproduces the standalone order AND interleaves
    // correctly with sibling topics when the asof is a merge child
    // (first-right-time emission returned different rows under
    // limit/offset there).
    //
    // ONE-PASS EMISSION: the matched left is exactly the _lastLeft of
    // its FIRST matched right (a groupBy per _leftSeq said the same
    // thing, but as a SECOND consumer of the window pipeline — the
    // whole scan+exchange+sort ran once per output branch before the
    // final union; the plan audit counted both). A row_number over the
    // same exchange (hashpartitioning(keys) satisfies the
    // (keys, _leftSeq) clustering — extra local sort, no new shuffle)
    // marks the first right, which then EXPLODES into (left, right)
    // while every later right explodes into just itself. Single
    // pipeline, no union, half the scans.
    val wr = Window
      .partitionBy((keys.map(col) :+ col("_leftSeq")): _*)
      .orderBy(col("_t"), col("_tie"))
    val withRn = matchedRights.withColumn("_rn", row_number().over(wr))
    val kept = if (immediate) withRn.where(col("_rn") === 1) else withRn

    val leftEmit = struct(
      col("_lastLeft").getField(timeCol).as("_emit_time"),
      lit(0).as("_eside"),
      col("_lastLeft").as("_lr"),
      lit(null).cast(rType).as("_rr"))
    val rightEmit = struct(
      col("_t").as("_emit_time"),
      lit(1).as("_eside"),
      lit(null).cast(lType).as("_lr"),
      col("_rrow").as("_rr"))
    val emitted = kept
      .select((keys.map(col) :+ explode(
        when(col("_rn") === 1, array(leftEmit, rightEmit))
          .otherwise(array(rightEmit))).as("_e")): _*)

    // project the union-by-name output shape: per field, the value
    // comes from whichever side's struct is non-null on this row
    // (exactly one is), left-side column order first like the previous
    // two-branch union
    val fields = (left.columns ++ right.columns).distinct.toSeq
      .filterNot(keys.contains)
    val dataCols = fields.map { f =>
      val inL = left.columns.contains(f)
      val inR = right.columns.contains(f)
      val c =
        if (inL && inR) coalesce(col("_e._lr").getField(f),
          col("_e._rr").getField(f))
        else if (inL) col("_e._lr").getField(f)
        else col("_e._rr").getField(f)
      c.as(f)
    }
    emitted.select((keys.map(col)
      :+ col("_e._emit_time").as("emit_time")
      :+ col("_e._eside").as("emit_side")) ++ dataCols: _*)
  }

  /** `neighbors` as-of: each RIGHT row matches its NEAREST left in
    * time on EITHER side (distance ties pick the earlier left), and
    * the match stands iff the distance is `< thresholdNs`
    * (0 = unbounded) — the symmetric sibling of [[join]]'s
    * at-or-before rule. DELIBERATE EXTENSION: the reference parses
    * the keyword but errors at compile
    * (server/executor/executor.go:206-207); the semantics here are
    * the natural completion a robotics user wants (nearest sensor
    * sample to each event, whichever side it falls on).
    *
    * Emission mirrors [[join]]: each matched left once, every
    * matching right (or, with `immediate`, only the NEAREST right per
    * left — distance ties pick the earlier right); `emit_time` is
    * each row's OWN time, so ordering by (emit_time, emit_side)
    * interleaves correctly under the producer-major merge even though
    * a matched right may now precede its left in time. Unmatched rows
    * on either side are dropped.
    *
    * Same physical shape as [[join]]: ONE hash exchange on `keys`,
    * one sort, one Window node (the backward last-left and forward
    * next-left frames share the partition/order spec), plus the
    * group-local row_number sort — no self-join, no second scan. A
    * left at the same time as a right sorts before it (side tie), so
    * it is that right's PREVIOUS left at distance 0 and always wins. */
  def neighbors(
      left: DataFrame,
      right: DataFrame,
      timeCol: String,
      keys: Seq[String],
      thresholdNs: Long,
      immediate: Boolean,
      tieCol: Option[String] = None
  ): DataFrame = {
    val lStruct = struct(left.columns.map(left(_)): _*)
    val rStruct = struct(right.columns.map(right(_)): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val l2 = left.select((keys.map(left(_)) :+ left(timeCol).as("_t")
      :+ lit(0).as("_side")
      :+ tieCol.map(left(_)).getOrElse(lit(0L)).as("_tie")
      :+ lStruct.as("_lrow")
      :+ lit(null).cast(rType).as("_rrow")): _*)
    val r2 = right.select((keys.map(right(_)) :+ right(timeCol).as("_t")
      :+ lit(1).as("_side")
      :+ tieCol.map(right(_)).getOrElse(lit(0L)).as("_tie")
      :+ lit(null).cast(lType).as("_lrow")
      :+ rStruct.as("_rrow")): _*)
    val u = l2.unionByName(r2)

    val wB = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val annotated = u
      .withColumn("_leftSeq",
        sum(when(col("_side") === 0, 1L).otherwise(0L)).over(wB))
      .withColumn("_prevLeft",
        last(col("_lrow"), ignoreNulls = true).over(wB))
      .withColumn("_nextLeft",
        first(col("_lrow"), ignoreNulls = true).over(wF))

    val dPrev = col("_t") - col("_prevLeft").getField(timeCol)
    val dNext = col("_nextLeft").getField(timeCol) - col("_t")
    // prev wins distance ties — with a same-time left, dPrev = 0 and
    // prev always wins, matching join()'s tie ordering
    val choosePrev = col("_prevLeft").isNotNull &&
      (col("_nextLeft").isNull || dPrev <= dNext)
    val chosen = annotated
      .withColumn("_dist", when(choosePrev, dPrev).otherwise(dNext))
      .withColumn("_theLeft",
        when(choosePrev, col("_prevLeft")).otherwise(col("_nextLeft")))
      // group id = the chosen left's ordinal: _leftSeq counts lefts
      // at-or-before, so the next left is number _leftSeq + 1
      .withColumn("_grp",
        when(choosePrev, col("_leftSeq")).otherwise(col("_leftSeq") + 1))

    val inRange =
      if (thresholdNs == 0L) lit(true)
      else col("_dist") < lit(thresholdNs)
    val matchedRights = chosen
      .where(col("_side") === 1 && col("_theLeft").isNotNull && inRange)

    // nearest-first within each left's group: rn = 1 is the closest
    // right (ties: earlier), carrying the left's one-time emission
    val wr = Window
      .partitionBy((keys.map(col) :+ col("_grp")): _*)
      .orderBy(col("_dist"), col("_t"), col("_tie"))
    val withRn = matchedRights.withColumn("_rn", row_number().over(wr))
    val kept = if (immediate) withRn.where(col("_rn") === 1) else withRn

    val leftEmit = struct(
      col("_theLeft").getField(timeCol).as("_emit_time"),
      lit(0).as("_eside"),
      col("_theLeft").as("_lr"),
      lit(null).cast(rType).as("_rr"))
    val rightEmit = struct(
      col("_t").as("_emit_time"),
      lit(1).as("_eside"),
      lit(null).cast(lType).as("_lr"),
      col("_rrow").as("_rr"))
    val emitted = kept
      .select((keys.map(col) :+ explode(
        when(col("_rn") === 1, array(leftEmit, rightEmit))
          .otherwise(array(rightEmit))).as("_e")): _*)

    val fields = (left.columns ++ right.columns).distinct.toSeq
      .filterNot(keys.contains)
    val dataCols = fields.map { f =>
      val inL = left.columns.contains(f)
      val inR = right.columns.contains(f)
      val c =
        if (inL && inR) coalesce(col("_e._lr").getField(f),
          col("_e._rr").getField(f))
        else if (inL) col("_e._lr").getField(f)
        else col("_e._rr").getField(f)
      c.as(f)
    }
    emitted.select((keys.map(col)
      :+ col("_e._emit_time").as("emit_time")
      :+ col("_e._eside").as("emit_side")) ++ dataCols: _*)
  }
}
