package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.model.EventsCatalog
import graft.stats.StatTiers

/** Distinct-count statistics tier (HLL sketches): exactly mergeable
  * partials, estimates calibrated against the exact counts the base
  * tier carries. Extends the reference's precompute-then-merge
  * statistics discipline (server/nodestore/statistics.go:305-313) to a
  * statistic dp3 lacks; the exact face is oracle `q_stats_distinct`.
  */
class DistinctTierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def messages = new EventsCatalog("/root/testdata/sf0.001")
    .messages(spark)

  test("rollup of 60 s partials serves the same estimates as a direct " +
      "hour tier (exact mergeability)") {
    val base = StatTiers.baseDistinct(messages, 60L * 1000000000L,
      "producer")
    val rolled = StatTiers.rollupDistinct(base, 60L)
    val direct = StatTiers.baseDistinct(messages, 3600L * 1000000000L,
      "producer")
    val a = StatTiers.serveDistinct(rolled)
      .select(col("producer"), col("topic"), col("start_ns"),
        col("distinct_est")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))
        -> r.getLong(3)).toMap
    val b = StatTiers.serveDistinct(direct)
      .select(col("producer"), col("topic"), col("start_ns"),
        col("distinct_est")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))
        -> r.getLong(3)).toMap
    assert(a.keySet == b.keySet && a.keySet.nonEmpty)
    assert(a.forall { case (k, v) => v == b(k) })
  }

  test("estimates track the exact counts the base tier carries") {
    // payload field `k`: many distinct values per bucket
    val base = StatTiers.baseDistinct(messages, 86400L * 1000000000L, "k")
    val rows = base
      .withColumn("est", hll_sketch_estimate(col("hll")))
      .select("distinct_exact", "est").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(0).toDouble
      val est = r.getLong(1).toDouble
      assert(math.abs(est - exact) <= math.max(1.0, 0.05 * exact),
        s"estimate $est vs exact $exact")
    }
  }

  test("cross-bucket union estimates the corpus-wide distinct count") {
    val base = StatTiers.baseDistinct(messages, 3600L * 1000000000L,
      "producer")
    // merge every bucket of every topic: distinct producers overall
    val est = base.agg(
      hll_sketch_estimate(hll_union_agg(col("hll"))).as("est"))
      .head.getLong(0).toDouble
    val exact = messages.select("producer").distinct().count().toDouble
    assert(math.abs(est - exact) <= math.max(1.0, 0.05 * exact))
  }
}
