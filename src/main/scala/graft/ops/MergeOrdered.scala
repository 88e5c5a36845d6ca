package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dp3's merge "join": an n-ary time-ordered union of message streams —
  * an ordered UNION ALL, not a relational join (reference:
  * server/executor/merge_node.go:31-130). Ties broken by child index
  * (merge_node.go:47-49).
  *
  * Spark-first: unionByName (null-filling schema differences) + a sort
  * on (time, child index). Catalyst plans the sort as a range-partition
  * exchange — fully parallel, no single-node heap. Under a `limit` the
  * optimizer rewrites it to TakeOrdered (no full sort at all).
  *
  * The child index is kept as `_mj` so callers can reproduce dp3's
  * deterministic tie order downstream.
  */
object MergeOrdered {

  def merge(children: Seq[DataFrame], timeCol: String = "time",
      descending: Boolean = false): DataFrame = {
    require(children.nonEmpty, "merge of zero children")
    val tagged = children.zipWithIndex.map { case (df, i) =>
      df.withColumn("_mj", lit(i))
    }
    val u = tagged.reduce(_.unionByName(_, allowMissingColumns = true))
    val ord =
      if (descending) Seq(col(timeCol).desc, col("_mj").asc)
      else Seq(col(timeCol).asc, col("_mj").asc)
    u.orderBy(ord: _*)
  }
}
