package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval joins — point-in-interval and interval-overlap — as
  * bucketized EQUI-joins. Not a reference operator; the telemetry
  * breadth companion to [[Sessionize]] (match events to the session,
  * segment, or recording window that contains them).
  *
  * Why not a plain theta join: Spark executes `l.key = r.key AND
  * l.time BETWEEN r.start AND r.end` as a sort-merge join on the key
  * alone with the range as a post-join filter — every key compares
  * |L_key| x |R_key| rows, quadratic in per-key cardinality, which is
  * exactly what dies at 100 TB (one hot producer with millions of
  * events and thousands of sessions). Bucketizing time turns it into
  * an equi-join on (key, bucket): each point carries ONE bucket, each
  * interval explodes into the buckets it spans, and the join only
  * pairs rows sharing a bucket — candidates drop from |L| x |R| per
  * key to per-bucket neighborhoods, the same inverted-index discipline
  * as the dedup family's shingle/band joins.
  *
  * `bucketWidth` (in the time columns' units) is the knob: comparable
  * to typical interval length.
  * Intervals spanning many buckets multiply the exploded side —
  * `maxBucketsPerInterval` is the runaway guard (a year-long interval
  * at 1-minute buckets is a 525 600-row explosion PER INTERVAL; the
  * cap throws rather than silently blowing up the shuffle, the same
  * throw-don't-degrade contract as Dedup.clusters' maxIters).
  */
object IntervalJoin {

  /** Join each point row to every same-key interval containing its
    * `timeCol` (closed interval: start <= t <= end). A point lands in
    * exactly ONE bucket, so each (point, interval) pair meets at most
    * once — no dedup stage. Output: the point row plus the interval
    * row's columns (interval time bounds under `startCol`/`endCol`).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], timeCol: String, startCol: String,
      endCol: String, bucketWidth: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one key")
    val exploded = explodeIntervals(intervals, startCol, endCol,
      bucketWidth, maxBucketsPerInterval)
    val p = points.withColumn("_bkt", expr(s"$timeCol div ${bucketWidth}L"))
    p.join(exploded, keys :+ "_bkt")
      .where(col(timeCol) >= col(startCol) && col(timeCol) <= col(endCol))
      .drop("_bkt")
  }

  /** All same-key (left, right) interval pairs that overlap:
    * [ls, le] ∩ [rs, re] ≠ ∅ (closed bounds). Both sides explode into
    * their bucket spans; a pair sharing several buckets would join
    * once per shared bucket, so the join keeps only the FIRST shared
    * bucket — `bucket == max(first(l), first(r))` — which dedups
    * arithmetically, without a distinct shuffle. Column names must not
    * collide across sides (pre-alias them). */
  def overlaps(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one key")
    val l = explodeIntervals(left, lStart, lEnd, bucketWidth,
      maxBucketsPerInterval)
    val r = explodeIntervals(right, rStart, rEnd, bucketWidth,
      maxBucketsPerInterval)
    l.join(r, keys :+ "_bkt")
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .where(col("_bkt") === greatest(
        expr(s"$lStart div ${bucketWidth}L"), expr(s"$rStart div ${bucketWidth}L")))
      .drop("_bkt")
  }

  /** One row per bucket the interval [start, end] touches. Malformed
    * (end < start) and over-wide intervals raise inside the job — the
    * throw-don't-degrade contract; a silent clamp would silently drop
    * matches. */
  private def explodeIntervals(df: DataFrame, startCol: String,
      endCol: String, bucketWidth: Long, maxBuckets: Int): DataFrame = {
    require(bucketWidth > 0, "bucket width must be positive")
    require(maxBuckets >= 1, "maxBucketsPerInterval >= 1")
    val first = expr(s"$startCol div ${bucketWidth}L")
    val last = expr(s"$endCol div ${bucketWidth}L")
    val lastChecked =
      when(col(endCol) < col(startCol), raise_error(format_string(
        s"interval end < start: %s > %s", col(startCol), col(endCol))))
      .when(last - first >= maxBuckets, raise_error(format_string(
        s"interval spans >= $maxBuckets buckets of width ${bucketWidth} " +
          "(start %s, end %s): widen bucketWidth or raise " +
          "maxBucketsPerInterval", col(startCol), col(endCol))))
      .otherwise(last)
    df.withColumn("_bkt", explode(sequence(first, lastChecked)))
  }
}
