package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode,
  LogicalPlan, Project}

/** Spread a narrow frame across the cluster before expensive per-row
  * work. Scan parallelism is bounded by parquet ROW GROUPS, not file
  * count: a small single-row-group file arrives as ONE task, and
  * everything up to the first exchange (tokenize, shingle, md5,
  * trigram masks) runs on one core while the rest of the cluster
  * idles — measured 3-4x on the documents table. The hash repartition
  * is deterministic and costs one tiny shuffle of the projected
  * columns; at real scale the input already has >= cluster
  * parallelism splits and this is the identity.
  *
  * The partition-count probe (`df.rdd.getNumPartitions`) is only free
  * on an exchange-free plan: under AQE, materializing `.rdd` on a plan
  * containing shuffles eagerly EXECUTES every upstream stage just to
  * read a count. So the probe is gated on the optimized plan being
  * project/filter over a leaf; any other shape skips it and
  * repartitions unconditionally (measured within noise of the probed
  * path on the sf0.1 dedup trio — see Dedup's A/B note).
  */
object Spread {

  private def scanRooted(plan: LogicalPlan): Boolean = plan match {
    case p: Project  => scanRooted(p.child)
    case f: Filter   => scanRooted(f.child)
    case _: LeafNode => true
    case _           => false
  }

  /** Repartition `df` by `by` to cluster parallelism unless a cheap
    * probe shows the scan already provides it. */
  def ensure(df: DataFrame, by: Seq[Column]): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    val probeSafe = scanRooted(df.queryExecution.optimizedPlan)
    if (probeSafe && df.rdd.getNumPartitions >= want) df
    else df.repartition(want, by: _*)
  }
}
