package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the telemetry companion to the as-of
  * join: group a key's time-ordered events into sessions separated by
  * quiet gaps longer than `gap` (device power cycles, drive
  * segments, user visits). Not a reference operator; part of the
  * analytics breadth a general engine owes its users.
  *
  * Scale shape: ONE hash shuffle on the key columns; the lag probe and
  * the running session counter are two stacked window functions over
  * the SAME partitioning and sort, so Catalyst plans a single exchange
  * + sort (no second shuffle). Session ids are key-local (globally
  * unique as (keys..., session_id)) — a global id would serialize
  * through one counter; the composite key keeps assignment
  * embarrassingly parallel at any scale. Skewed keys (one producer
  * with billions of events) are the caller's salt-or-split decision,
  * as with any keyed window.
  */
object Sessionize {

  /** Add `session_id` (1-based, per key): a new session starts at the
    * first event and whenever the gap since the previous event exceeds
    * `gap` (in `timeCol`'s units). `tieCols` make the order total when
    * timestamps collide (determinism rule: every window carries its
    * own tiebreak). */
  def assign(df: DataFrame, keys: Seq[String], timeCol: String,
      gap: Long, tieCols: Seq[String] = Seq.empty): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    require(gap > 0, "gap must be positive")
    val order: Seq[Column] = col(timeCol) +: tieCols.map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val prev = lag(col(timeCol), 1).over(w)
    val isNew = when(prev.isNull || col(timeCol) - prev > gap, 1L)
      .otherwise(0L)
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Per-session summary: one row per (keys..., session_id) with the
    * event count and [start, end] time bounds — the usual input to
    * session-length and engagement analyses. One additional map-side
    * combined aggregation over the sessionized frame. */
  def summarize(df: DataFrame, keys: Seq[String], timeCol: String,
      gap: Long, tieCols: Seq[String] = Seq.empty): DataFrame =
    assign(df, keys, timeCol, gap, tieCols)
      .groupBy((keys :+ "session_id").map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(timeCol)).as("start_time"),
        max(col(timeCol)).as("end_time"))
}
