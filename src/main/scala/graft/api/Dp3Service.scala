package graft.api

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

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
  *
  * Truncation state: dp3 truncates by recording a version watermark in
  * the rootmap (server/rootmap/sqlrootmap.go:372-404). Here the
  * service keeps the watermark registry and every scan (queries,
  * export, stats) goes through it — with event time standing in for
  * ingest time, `truncate p t <ts>` hides (p, t) rows with
  * time < ts from all subsequent calls, and `now` hides everything.
  */
final class Dp3Service(underlying: MessageCatalog,
    rawMessages: SparkSession => DataFrame) {

  /** (producer, topic) → hide rows with time < asOfNs */
  private val truncatedBelow = TrieMap[(String, String), Long]()

  private def maskTopic(df: DataFrame, topic: String): DataFrame =
    truncatedBelow.foldLeft(df) {
      case (acc, ((p, t), ns)) if t == topic =>
        acc.where(!(col("producer") === p && col("time") < ns))
      case (acc, _) => acc
    }

  private def maskAll(df: DataFrame): DataFrame =
    truncatedBelow.foldLeft(df) { case (acc, ((p, t), ns)) =>
      acc.where(!(col("producer") === p && col("topic") === t
        && col("time") < ns))
    }

  /** catalog view with truncation masks applied at every scan */
  private val catalog: MessageCatalog = new MessageCatalog {
    override def scanTopic(spark: SparkSession, topic: String): DataFrame =
      maskTopic(underlying.scanTopic(spark, topic), topic)
    override def producers(spark: SparkSession,
        topics: Seq[String]): Seq[String] =
      underlying.producers(spark, topics)
    override def truncationVersion(producer: String,
        topic: String): Long = underlying.truncationVersion(producer, topic)
  }

  private def messages(spark: SparkSession): DataFrame =
    maskAll(rawMessages(spark))

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

  /** Messages pre-filtered to the bins overlapping [startNs, endNs) —
    * bin-aligned so the contained aggregates are exact, and expressed
    * on the raw `time` column so parquet row-group/partition pruning
    * applies (a narrow stat request must not scan the whole table). */
  private def binAligned(spark: SparkSession, widthNs: Long,
      startNs: Long, endNs: Long): DataFrame = {
    val lo = math.floorDiv(startNs, widthNs) * widthNs
    val hi =
      if (endNs >= Long.MaxValue - widthNs) Long.MaxValue
      else math.floorDiv(endNs + widthNs - 1, widthNs) * widthNs
    messages(spark).where(col("time") >= lo && col("time") < hi)
  }

  /** /statrange: flat per-bin stat records at the requested
    * granularity — coarsest tier at least as fine, "too granular"
    * below the base tier (reference: server/tree/tree.go:214-258).
    * Returns every bin OVERLAPPING [startNs, endNs), like the
    * reference's tree descent (tree.go:237). */
  def statRange(spark: SparkSession, granularityNs: Long,
      startNs: Long = 0L, endNs: Long = Long.MaxValue): DataFrame = {
    val width = StatTiers.pickTierWidth(granularityNs)
    val tier = StatTiers.tierAt(
      binAligned(spark, width, startNs, endNs), width)
    StatTiers.serve(tier)
      .where(col("start_ns") < endNs && col("end_ns") > startNs)
  }

  /** /statistics: merged bins with the reference's parameter surface —
    * topic/producer restriction, time range, granularity,
    * groupByProducer (reference: server/treemgr/treemgr.go:384-501). */
  def statistics(spark: SparkSession, granularityNs: Long,
      groupByProducer: Boolean,
      topics: Seq[String] = Nil, producers: Seq[String] = Nil,
      startNs: Long = 0L, endNs: Long = Long.MaxValue): DataFrame = {
    val width = StatTiers.pickTierWidth(granularityNs)
    var m = binAligned(spark, width, startNs, endNs)
    if (topics.nonEmpty) m = m.where(col("topic").isin(topics: _*))
    if (producers.nonEmpty)
      m = m.where(col("producer").isin(producers: _*))
    StatTiers.mergeBins(StatTiers.tierAt(m, width), groupByProducer)
      .where(col("bucket") * width < endNs
        && (col("bucket") + 1) * width > startNs)
  }

  /** /statistics/available */
  def statisticsAvailable(spark: SparkSession,
      numericFields: Seq[String], textFields: Seq[String]): DataFrame =
    StatTiers.available(messages(spark), numericFields, textFields)

  /** /export: ordered multi-topic merge of the named topics. */
  def export(spark: SparkSession, topics: Seq[String]): DataFrame =
    Export.exportMerged(topics.map(t => catalog.scanTopic(spark, t)))

  /** truncate statement: records the watermark (visible to every
    * subsequent query/export/stat call on this service) and returns
    * the masked message view. */
  def truncate(spark: SparkSession, stmt: String): DataFrame =
    Parser.parse(stmt) match {
      case t: TruncateStmt =>
        truncatedBelow((t.producer, t.topic)) =
          t.asOf.getOrElse(Long.MaxValue)
        Lifecycle.applyTruncateStatement(spark, rawMessages(spark), t)
      case _: Query => throw new IllegalArgumentException(
        "not a truncate statement")
    }
}
