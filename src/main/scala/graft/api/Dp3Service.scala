package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.export.Export
import graft.model.MessageCatalog
import graft.plan.Planner
import graft.ql.{Parser, Query, TruncateStmt}
import graft.stats.StatTiers
import graft.streaming.Lifecycle

/** The reference's complete user-facing verb set as one typed facade —
  * a dp3 user maps each HTTP endpoint (reference: server/routes/
  * routes.go:51-60) onto one method here and runs the same workloads:
  *
  *   POST /databases/{db}/query       → query / queryNdjson / explain
  *   POST /databases/{db}/import      → graft.mcap.Mcap.load +
  *                                       graft.streaming.Ingest
  *   GET  /statrange                  → statRange
  *   GET  /databases/{db}/statistics  → statistics
  *   .../statistics/available        → statisticsAvailable
  *   POST /export                     → export
  *   truncate statement               → truncate
  *
  * Everything is lazy DataFrames — callers compose further or write
  * out; nothing materializes on the driver.
  */
final class Dp3Service(catalog: MessageCatalog,
    messages: SparkSession => DataFrame) {

  /** Run a QL statement; explain queries return the plan as rows
    * (reference: server/routes/query.go:138-161). */
  def query(spark: SparkSession, ql: String): DataFrame =
    new Planner(catalog).run(spark, ql)

  /** Query with NDJSON serialization — the Accept: application/json
    * path (reference: server/mcap/mcap_to_json.go:42-142). */
  def queryNdjson(spark: SparkSession, ql: String,
      dataCols: Seq[String]): Dataset[String] =
    Export.ndjson(query(spark, ql), dataCols)

  /** Per-operator instrumented explain (reference NodeStats). */
  def explainAnalyze(spark: SparkSession, ql: String)
      : Seq[(String, Long)] =
    new Planner(catalog).explainAnalyze(spark, ql)

  /** /statrange: flat per-bin stat records at the requested
    * granularity (coarsest tier at least as fine — errors "too
    * granular" below the base tier, reference: server/tree/
    * tree.go:214-258). */
  def statRange(spark: SparkSession, granularityNs: Long,
      startNs: Long = 0L, endNs: Long = Long.MaxValue): DataFrame = {
    val width = StatTiers.pickTierWidth(granularityNs)
    var tier = StatTiers.base(messages(spark), StatTiers.BaseWidthNs)
    var w = StatTiers.BaseWidthNs
    while (w < width) { tier = StatTiers.rollup(tier, StatTiers.Branching)
      w *= StatTiers.Branching }
    import org.apache.spark.sql.functions.col
    StatTiers.serve(tier)
      .where(col("start_ns") >= startNs && col("end_ns") <= endNs)
  }

  /** /statistics: cross-producer merged bins (reference:
    * server/treemgr/treemgr.go:384-501). */
  def statistics(spark: SparkSession, granularityNs: Long,
      groupByProducer: Boolean): DataFrame = {
    val width = StatTiers.pickTierWidth(granularityNs)
    var tier = StatTiers.base(messages(spark), StatTiers.BaseWidthNs)
    var w = StatTiers.BaseWidthNs
    while (w < width) { tier = StatTiers.rollup(tier, StatTiers.Branching)
      w *= StatTiers.Branching }
    StatTiers.mergeBins(tier, groupByProducer)
  }

  /** /statistics/available */
  def statisticsAvailable(spark: SparkSession,
      numericFields: Seq[String], textFields: Seq[String]): DataFrame =
    StatTiers.available(messages(spark), numericFields, textFields)

  /** /export: ordered multi-topic merge of the named topics. */
  def export(spark: SparkSession, topics: Seq[String]): DataFrame =
    Export.exportMerged(topics.map(t => catalog.scanTopic(spark, t)))

  /** truncate statement → masked message view (reference:
    * server/rootmap/sqlrootmap.go:372-404). */
  def truncate(spark: SparkSession, stmt: String): DataFrame =
    Parser.parse(stmt) match {
      case t: TruncateStmt =>
        Lifecycle.applyTruncateStatement(spark, messages(spark), t)
      case _: Query => throw new IllegalArgumentException(
        "not a truncate statement")
    }
}
