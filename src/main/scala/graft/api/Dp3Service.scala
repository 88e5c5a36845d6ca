package graft.api

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, max}

import graft.export.Export
import graft.model.MessageCatalog
import graft.plan.Planner
import graft.ql.{Parser, Query, TruncateStmt}
import graft.stats.StatTiers
import graft.streaming.Lifecycle

/** The maintained stats + control tables of an ingested layout
  * (`Ingest.startWithStats`) — dp3's inner-node statistics and rootmap
  * re-expressed as two small append-only parquet tables. */
final case class IngestStore(
    stats: SparkSession => DataFrame,
    control: SparkSession => DataFrame,
    fieldStats: Option[SparkSession => DataFrame] = None)

object IngestStore {
  def apply(cat: graft.model.IngestedCatalog): IngestStore =
    IngestStore(s => cat.stats(s), s => cat.control(s),
      fieldStats = cat.fieldStats)
}

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
  * With an `IngestStore`, statRange/statistics are served from the
  * maintained base-tier partials — summary rows, never raw messages
  * (reference: server/tree/tree.go:214-258, "trillions of points under
  * a second" from precomputed aggregates, doc/paper/dp3.tex:192-196) —
  * and truncation follows the reference exactly: the statement's
  * timestamp resolves via the control table to the latest ingest
  * version at or before it (server/rootmap/sqlrootmap.go:372-404), and
  * data, stats and exports hide everything at or below that version.
  * Without a store, stats fall back to on-the-fly aggregation and
  * event time stands in for the ingest clock.
  */
final class Dp3Service(underlying: MessageCatalog,
    rawMessages: SparkSession => DataFrame,
    store: Option[IngestStore] = None,
    schemaRegistry: Option[SparkSession => DataFrame] = None,
    val databaseName: String = "default") {

  /** (producer, topic) → hide rows with ingest_version <= v
    * (reference truncation watermark: server/rootmap/rootmap.go:24-79) */
  private val truncatedVersion = TrieMap[(String, String), Long]()

  /** (producer, topic) → deleted [start_ns, end_ns) ranges
    * (reference: deletes are masked ranges resolved at read,
    * server/tree/tree.go:147-207) */
  private val deletedRanges =
    TrieMap[(String, String), Vector[(Long, Long)]]()

  /** (producer, topic) → hide rows with time < asOfNs — the stand-in
    * semantics for catalogs with no ingest metadata */
  private val truncatedBelow = TrieMap[(String, String), Long]()

  /** version masks apply to any frame carrying ingest_version —
    * data rows and stat partials alike (whole-batch masking is what
    * makes truncated stats exact with no re-aggregation) */
  private def maskVersions(df: DataFrame): DataFrame =
    if (!df.columns.contains("ingest_version")) df
    else truncatedVersion.foldLeft(df) { case (acc, ((p, t), v)) =>
      acc.where(!(col("producer") === p && col("topic") === t
        && col("ingest_version") <= v))
    }

  private def maskDeletes(df: DataFrame,
      topic: Option[String]): DataFrame =
    deletedRanges.foldLeft(df) {
      case (acc, ((p, t), ranges)) if topic.forall(_ == t) =>
        ranges.foldLeft(acc) { case (a, (s, e)) =>
          a.where(!(col("producer") === p && col("topic") === t
            && col("time") >= s && col("time") < e))
        }
      case (acc, _) => acc
    }

  private def maskTopic(df: DataFrame, topic: String): DataFrame =
    maskDeletes(maskVersions(truncatedBelow.foldLeft(df) {
      case (acc, ((p, t), ns)) if t == topic =>
        acc.where(!(col("producer") === p && col("time") < ns))
      case (acc, _) => acc
    }), Some(topic))

  private def maskAll(df: DataFrame): DataFrame =
    maskDeletes(maskVersions(truncatedBelow.foldLeft(df) {
      case (acc, ((p, t), ns)) =>
        acc.where(!(col("producer") === p && col("topic") === t
          && col("time") < ns))
    }), None)

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

  /** The maintained stat partials adapted to the statfilter's
    * per-field naming — write-time statistics powering plan-time chunk
    * skips, exactly the reference's statfilter-during-descent
    * (server/tree/iterator.go:173-199). A per-FIELD partials table
    * (`Ingest.startWithStats(fieldStats = ...)`) already carries the
    * statfilter column shapes, including text min/max and trigram
    * words, so every stats-backed field prunes; without one, the base
    * tier's `value` min/max is adapted. Version masks apply either way
    * so truncated batches stop vouching for their buckets. */
  private def statSource: Option[Planner.StatSource] = store.map { st =>
    val partialsOf: SparkSession => DataFrame =
      st.fieldStats.getOrElse(st.stats)
    Planner.StatSource(
      st.fieldStats match {
        case Some(fs) => s => maskVersions(fs(s))
        case None => s => maskVersions(st.stats(s)).select(
          col("producer"), col("topic"), col("bucket"),
          col("num_min").as("value__min"),
          col("num_max").as("value__max"))
      },
      StatTiers.BaseWidthNs,
      // StatSource's coverage contract, verified rather than assumed:
      // the tier vouches for a scan only if EVERY unmasked ingest
      // version that wrote data also wrote partials into THIS stats
      // table. That breaks in reachable ways — fieldStats enabled on a
      // store with pre-existing versions, or an /import that appends a
      // version without per-field partials — and a tier missing a
      // version would prune buckets containing that version's rows
      // (the reference keeps chunks with missing stats; so must we).
      // The check compares (producer, topic, ingest_version) triples
      // of the control table against the stats table — two
      // kilobyte-scale reads, once per statement (the Planner samples
      // the witness once per instance). Unprovable (no version column,
      // unreadable table) => false => pruning off, results exact.
      coverage = s => {
        val ctl = maskVersions(st.control(s))
        val parts = maskVersions(partialsOf(s))
        val key = Seq("producer", "topic", "ingest_version")
        key.forall(ctl.columns.contains) &&
          key.forall(parts.columns.contains) && {
            import org.apache.spark.sql.functions.broadcast
            ctl.select(key.map(col): _*)
              .join(broadcast(parts.select(key.map(col): _*).distinct()),
                key, "left_anti")
              .isEmpty
          }
      })
  }

  /** Envelope columns a skeleton query keeps — everything else is
    * payload. Matches the reference's skeleton ("stamps only") mode:
    * message records keep topic/sequence/timestamps, payload bytes are
    * emptied (server/routes/query.go:43 StampsOnly,
    * server/mcap/merge_coordinator.go:89-92 `msg.Data = []byte{}`,
    * schema data likewise emptied at :30-31). */
  private val skeletonEnvelope = Set("topic", "producer", "seq",
    "time", "time_us", "publish_time", "schema_name", "ingest_version")

  /** Run a QL statement; explain queries return the plan as rows
    * (reference: server/routes/query.go:138-161). With
    * `skeleton = true` the result keeps its row sequence and envelope
    * columns but carries no payload: a binary `data` column is emptied
    * in place (the reference's exact behavior), typed payload columns
    * are dropped (their decoded analogue). A pure projection over the
    * ordered plan — the sort order and row count are untouched, and
    * Catalyst prunes the payload columns out of the scan entirely, so
    * skeleton queries read strictly less data. */
  def query(spark: SparkSession, ql: String,
      skeleton: Boolean = false): DataFrame = {
    // the planner's order keys (emit_time/_mj/emit_side) stay available
    // to library callers that re-sort (SparkEntry's oracle queries);
    // the service surface emits message fields only, like the
    // reference's responses — a post-sort projection, order untouched
    val df = new Planner(catalog, statSource).run(spark, ql)
      .drop("emit_time", "_mj", "emit_side")
    if (!skeleton || df.columns.sameElements(Array("plan"))) df
    else {
      val cols = df.schema.fields.toSeq.flatMap { f =>
        if (skeletonEnvelope.contains(f.name)) Some(col(f.name))
        else if (f.name == "data"
          && f.dataType == org.apache.spark.sql.types.BinaryType)
          Some(lit(Array.emptyByteArray).as("data"))
        else None
      }
      df.select(cols: _*)
    }
  }

  /** Query with NDJSON serialization — the Accept: application/json
    * path (reference: server/mcap/mcap_to_json.go:42-142). */
  def queryNdjson(spark: SparkSession, ql: String,
      dataCols: Seq[String]): Dataset[String] =
    Export.ndjson(query(spark, ql), dataCols)

  /** Per-operator instrumented explain — the reference NodeStats
    * tuples/bytes/time triple per plan node. */
  def explainAnalyze(spark: SparkSession, ql: String)
      : Seq[Planner.NodeMetrics] =
    new Planner(catalog, statSource).explainAnalyze(spark, ql)

  /** Messages pre-filtered to the bins overlapping [startNs, endNs) —
    * bin-aligned so the contained aggregates are exact, and expressed
    * on the raw `time` column so parquet row-group/partition pruning
    * applies (a narrow stat request must not scan the whole table). */
  private def binAligned(spark: SparkSession, widthNs: Long,
      startNs: Long, endNs: Long): DataFrame = {
    val (lo, hi) = alignedRange(widthNs, startNs, endNs)
    messages(spark).where(col("time") >= lo && col("time") < hi)
  }

  private def alignedRange(widthNs: Long, startNs: Long,
      endNs: Long): (Long, Long) = {
    val lo = math.floorDiv(startNs, widthNs) * widthNs
    val hi =
      if (endNs >= Long.MaxValue - widthNs) Long.MaxValue
      else math.floorDiv(endNs + widthNs - 1, widthNs) * widthNs
    (lo, hi)
  }

  /** The maintained stat partials pruned to the buckets covering
    * [startNs, endNs) — summary rows only; the bucket-range predicate
    * prunes the stats scan. None without a store. */
  private def prunedPartials(spark: SparkSession, widthNs: Long,
      startNs: Long, endNs: Long,
      restrict: DataFrame => DataFrame): Option[DataFrame] =
    store.map { st =>
      val (lo, hi) = alignedRange(widthNs, startNs, endNs)
      val b = StatTiers.BaseWidthNs
      val loBucket = math.floorDiv(lo, b)
      val hiBucket =
        if (hi >= Long.MaxValue - b) Long.MaxValue
        else math.floorDiv(hi + b - 1, b)
      maskVersions(restrict(st.stats(spark)))
        .where(col("bucket") >= loBucket && col("bucket") < hiBucket)
    }

  /** /statrange: flat per-bin stat records at the requested
    * granularity — coarsest tier at least as fine, "too granular"
    * below the base tier (reference: server/tree/tree.go:214-258).
    * Returns every bin OVERLAPPING [startNs, endNs), like the
    * reference's tree descent (tree.go:237).
    *
    * Served entirely on the columnar sketch-row path (round 13):
    * stats roll up via primitive HashAggregate, quantiles via the
    * exploded (kb, c) row face — no ObjectHashAggregate and no
    * interpreted UDF anywhere in the plan (Dp3ServiceSpec gates the
    * shape), matching the reference's "served mostly from RAM"
    * flagship surface. */
  def statRange(spark: SparkSession, granularityNs: Long,
      startNs: Long = 0L, endNs: Long = Long.MaxValue): DataFrame = {
    val width = StatTiers.pickTierWidth(granularityNs)
    val served =
      prunedPartials(spark, width, startNs, endNs, identity) match {
        case Some(partials) => StatTiers.serveFromPartials(partials, width)
        case None => StatTiers.serveFromMessages(
          binAligned(spark, width, startNs, endNs), width)
      }
    served.where(col("start_ns") < endNs && col("end_ns") > startNs)
  }

  /** /statrange with the reference's per-field surface (the reference
    * serves statistics for every flattened schema field —
    * server/nodestore/statistics.go:305-313): flat (bin × field)
    * records for the requested fields, optionally topic-restricted.
    *
    * With a store maintaining PER-FIELD partials that cover every
    * requested field, the request is served from summary rows alone
    * (bucket-pruned, associatively rolled to the requested width) —
    * the same stored table that backs statfilter pruning, serving both
    * roles like the reference's nodestore statistics. Otherwise one
    * groupBy aggregates the bin-aligned raw messages. */
  def statRangeFields(spark: SparkSession, granularityNs: Long,
      numericFields: Seq[String], textFields: Seq[String] = Nil,
      topic: Option[String] = None,
      startNs: Long = 0L, endNs: Long = Long.MaxValue): DataFrame = {
    val width = StatTiers.pickTierWidth(granularityNs)
    val stored = store.flatMap(_.fieldStats).map(fs =>
        maskVersions(fs(spark))).filter { p =>
      val cols = p.columns.toSet
      numericFields.forall(f => cols.contains(s"${f}__min")) &&
        textFields.forall(f => cols.contains(s"${f}__tmin"))
    }
    val served = stored match {
      case Some(partials0) =>
        // the all-codegen split path: non-sketch columns roll up via
        // primitive aggregates, quantiles via the per-field (kb, c)
        // row face — no typed aggregator on the serving surface
        val (lo, hi) = alignedRange(width, startNs, endNs)
        val b = StatTiers.BaseWidthNs
        val hiBucket = if (hi >= Long.MaxValue - b) Long.MaxValue
          else math.floorDiv(hi + b - 1, b)
        var partials = partials0
          .where(col("bucket") >= math.floorDiv(lo, b)
            && col("bucket") < hiBucket)
        topic.foreach(t => partials = partials
          .where(col("topic") === t))
        StatTiers.serveFieldsFromPartials(partials, width,
          numericFields, textFields)
      case None =>
        var m = binAligned(spark, width, startNs, endNs)
        topic.foreach(t => m = m.where(col("topic") === t))
        val base = StatTiers.baseFields(m, StatTiers.BaseWidthNs,
          numericFields, textFields)
        StatTiers.serveFieldsFromPartials(base, width,
          numericFields, textFields)
    }
    served.where(col("start_ns") < endNs && col("end_ns") > startNs)
  }

  /** /statistics: merged bins with the reference's parameter surface —
    * topic/producer restriction, time range, granularity,
    * groupByProducer (reference: server/treemgr/treemgr.go:384-501).
    * Served as flat stat records (incl. quantiles) on the same
    * columnar path as [[statRange]]; producer-merged bins just drop
    * `producer` from the grouping keys — quantile sketches merge by
    * summing (kb, c) rows across producers, all codegen. */
  def statistics(spark: SparkSession, granularityNs: Long,
      groupByProducer: Boolean,
      topics: Seq[String] = Nil, producers: Seq[String] = Nil,
      startNs: Long = 0L, endNs: Long = Long.MaxValue): DataFrame = {
    val width = StatTiers.pickTierWidth(granularityNs)
    val keys =
      if (groupByProducer) Seq("producer", "topic") else Seq("topic")
    val restrict = (df: DataFrame) => {
      var m = df
      if (topics.nonEmpty) m = m.where(col("topic").isin(topics: _*))
      if (producers.nonEmpty)
        m = m.where(col("producer").isin(producers: _*))
      m
    }
    val served =
      prunedPartials(spark, width, startNs, endNs, restrict) match {
        case Some(partials) =>
          StatTiers.serveFromPartials(partials, width, keys = keys)
        case None => StatTiers.serveFromMessages(
          restrict(binAligned(spark, width, startNs, endNs)), width,
          keys = keys)
      }
    served.where(col("start_ns") < endNs && col("end_ns") > startNs)
  }

  /** /statistics/available */
  def statisticsAvailable(spark: SparkSession,
      numericFields: Seq[String], textFields: Seq[String]): DataFrame =
    store match {
      // which (producer, topic) exist is a control-table lookup, not a
      // data scan (reference: server/treemgr/treemgr.go:569-653)
      case Some(st) => StatTiers.available(
        maskVersions(st.control(spark)), numericFields, textFields)
      case None => StatTiers.available(messages(spark), numericFields,
        textFields)
    }

  /** /export: ordered multi-topic merge of the named topics. */
  def export(spark: SparkSession, topics: Seq[String]): DataFrame =
    Export.exportMerged(topics.map(t => catalog.scanTopic(spark, t)))

  /** /export with the reference's follow/tail contract (reference:
    * server/routes/export.go:50-67 resolves the latest versioned roots
    * and hands the client a topic → version header to poll with;
    * cli/cmd/tail.go:51-82 loops exactly that): rows of each topic
    * STRICTLY NEWER than `sinceVersions(topic)` and at or below the
    * latest version the control table records right now, merged in
    * stream order. Returns (delta frame, topic → latest version) — the
    * caller sends the map back on its next poll, making each poll an
    * exactly-once version-interval read: the upper bound pins the
    * snapshot, so an import landing mid-scan is not half-read now and
    * re-read later.
    *
    * Version resolution is a control-table lookup (kilobytes); without
    * a store, max(seq) stands in for the ingest clock per the repo-wide
    * convention (Lifecycle.applyTruncations). */
  def exportSince(spark: SparkSession, topics: Seq[String],
      sinceVersions: Map[String, Long] = Map.empty,
      producer: Option[String] = None,
      startNs: Long = 0L, endNs: Long = Long.MaxValue)
      : (DataFrame, Map[String, Long]) = {
    require(topics.nonEmpty, "export of zero topics")
    val verCol = if (store.isDefined) "ingest_version" else "seq"
    val latest: Map[String, Long] = {
      var src = store match {
        case Some(st) => maskVersions(st.control(spark))
        case None     => messages(spark)
      }
      src = src.where(col("topic").isin(topics: _*))
      producer.foreach(p => src = src.where(col("producer") === p))
      src.groupBy(col("topic")).agg(max(col(verCol)).as("v"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val frames = topics.map { t =>
      var df = catalog.scanTopic(spark, t)
      producer.foreach(p => df = df.where(col("producer") === p))
      if (startNs > 0L || endNs < Long.MaxValue)
        df = df.where(col("time") >= startNs && col("time") < endNs)
      latest.get(t) match {
        case None => df.where(lit(false)) // no versions: provably empty
        case Some(hi) =>
          val lo = sinceVersions.getOrElse(t, 0L)
          df.where(col(verCol) > lo && col(verCol) <= hi)
      }
    }
    (Export.exportMerged(frames), latest)
  }

  /** truncate statement. With a store, the statement's timestamp
    * resolves through the control table to the latest ingest version
    * whose ingest time is at or before it — exactly the reference's
    * rootmap resolution (server/rootmap/sqlrootmap.go:372-404) — and
    * all subsequent queries/stats/exports hide versions at or below
    * the watermark. Without a store, event time stands in for the
    * ingest clock. Returns the masked message view. */
  def truncate(spark: SparkSession, stmt: String): DataFrame =
    Parser.parse(stmt) match {
      case t: TruncateStmt =>
        store match {
          case Some(st) =>
            val entries = st.control(spark)
              .where(col("producer") === t.producer
                && col("topic") === t.topic)
            val resolved = t.asOf match {
              case None => entries // `now`: every version ingested so far
              case Some(ts) => entries.where(col("ingest_time_ns") <= ts)
            }
            // control table is kilobytes (one row per batch × table) —
            // this collect is a control-plane lookup, like the
            // reference's SQL query, not a data-plane action
            val row = resolved.agg(max(col("ingest_version"))).head()
            if (!row.isNullAt(0))
              truncatedVersion((t.producer, t.topic)) = row.getLong(0)
            messages(spark)
          case None =>
            truncatedBelow((t.producer, t.topic)) =
              t.asOf.getOrElse(Long.MaxValue)
            Lifecycle.applyTruncateStatement(spark, rawMessages(spark), t)
        }
      case _: Query => throw new IllegalArgumentException(
        "not a truncate statement")
    }

  // --- catalog listings (reference: server/routes/routes.go:51-60) ------

  /** GET /databases (reference: server/routes/databases.go) — this
    * facade fronts one database (multi-database deployments run one
    * catalog per database directory), so the listing is the
    * configured name. */
  def databases(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(databaseName).toDF("database")
  }

  /** GET /databases/{db}/topics — the distinct topic list
    * (reference: server/routes/topics.go, treemgr.Topics). With a
    * store this is a control-table lookup; never a data scan. */
  def topics(spark: SparkSession): DataFrame = (store match {
    case Some(st) => maskVersions(st.control(spark))
    case None => messages(spark)
  }).select("topic").distinct().orderBy("topic")

  /** GET /databases/{db}/producers (reference:
    * server/routes/producers.go, treemgr.Producers). */
  def producersList(spark: SparkSession): DataFrame = (store match {
    case Some(st) => maskVersions(st.control(spark))
    case None => messages(spark)
  }).select("producer").distinct().orderBy("producer")

  /** GET /databases/{db}/tables — per-(producer, topic) table state:
    * latest ingest version, message count and time bounds;
    * `historical = true` returns every version like the reference's
    * historical rootmap listing (reference: server/routes/tables.go,
    * treemgr.GetTables). */
  def tables(spark: SparkSession, producer: Option[String] = None,
      topic: Option[String] = None,
      historical: Boolean = false): DataFrame = {
    val base = store match {
      case Some(st) => maskVersions(st.control(spark))
      case None =>
        // no ingest metadata: synthesize one "version" per table from
        // the data itself (max seq stands in for the ingest clock)
        messages(spark).groupBy(col("producer"), col("topic"))
          .agg(count(lit(1)).as("msg_count"),
            org.apache.spark.sql.functions.min(col("time"))
              .as("min_time"),
            max(col("time")).as("max_time"),
            max(col("seq")).as("ingest_version"))
    }
    var t = base
    producer.foreach(p => t = t.where(col("producer") === p))
    topic.foreach(tp => t = t.where(col("topic") === tp))
    val out =
      if (historical) t
      else {
        // latest version per table — a window over the kilobyte-scale
        // control table, not over data
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("producer"), col("topic"))
          .orderBy(col("ingest_version").desc)
        t.withColumn("_rn",
            org.apache.spark.sql.functions.row_number().over(w))
          .where(col("_rn") === 1).drop("_rn")
      }
    out.orderBy("producer", "topic")
  }

  /** GET /databases/{db}/schemas/{hash} — schema-registry lookup;
    * throws like the reference's 404 when the hash is unknown
    * (reference: server/routes/schemas.go, schemastore
    * ErrSchemaNotFound). Back the registry with
    * [[graft.mcap.Mcap.loadSchemas]] over the import directory. */
  def schemaFor(spark: SparkSession, hash: String)
      : org.apache.spark.sql.Row = {
    val reg = schemaRegistry.getOrElse(throw new IllegalStateException(
      "no schema registry configured"))
    val rows = reg(spark).where(col("schema_hash") === hash).take(1)
    if (rows.isEmpty)
      throw new NoSuchElementException(s"schema not found: $hash")
    rows.head
  }

  /** POST /delete — range delete on (producer, topic, [start, end));
    * validates like the reference (server/routes/delete.go) and masks
    * the range from every subsequent query, stat, and export. */
  def delete(producer: String, topic: String, startNs: Long,
      endNs: Long): Unit = {
    require(producer.nonEmpty, "missing producer")
    require(topic.nonEmpty, "missing topic")
    require(endNs > startNs,
      s"end ($endNs) must be greater than start ($startNs)")
    val key = (producer, topic)
    deletedRanges(key) =
      deletedRanges.getOrElse(key, Vector.empty) :+ ((startNs, endNs))
  }

  // --- MCAP output (reference: server/routes/export.go:32-81) -----------

  /** Query with MCAP serialization — the reference's primary output
    * surface: one multiplexed stream, schema/channel ids remapped in
    * first-appearance order (server/mcap/merge_coordinator.go). With
    * `explain = true` the stream carries the per-node execution stats
    * as an in-band "query" Metadata record, like the reference's
    * instrumented run (server/executor/executor.go:87-94); read it
    * back with [[graft.mcap.Mcap.readMetadata]]. */
  def queryMcap(spark: SparkSession, ql: String,
      dataCols: Seq[String], explain: Boolean = false): Array[Byte] =
    Export.mcap(query(spark, ql), dataCols, explain)

  /** [[queryMcap]] with the data columns inferred (everything outside
    * the skeleton envelope) — the HTTP query route's MCAP face, so a
    * client asking for `"mcap": true` needs no column knowledge. */
  def queryMcapAuto(spark: SparkSession, ql: String,
      explain: Boolean = false): Array[Byte] = {
    val df = query(spark, ql)
    Export.mcap(df,
      df.columns.filterNot(skeletonEnvelope.contains).toSeq, explain)
  }

  /** The reference's explain-request path, end to end: run the query
    * instrumented, serialize the result MCAP with the in-band "query"
    * stats record, then read the record back out of the stream and
    * wrap it as `{"explain": ...}` — exactly the produce-then-parse
    * round trip of server/routes/query.go:53-90 (writeJSONExplain),
    * which also keeps the read path honest. */
  def queryExplainJson(spark: SparkSession, ql: String): String = {
    val df = query(spark, ql)
    val dataCols =
      df.columns.filterNot(skeletonEnvelope.contains).toSeq
    val bytes = Export.mcap(df, dataCols, explain = true)
    val ctx = graft.mcap.Mcap.readMetadata(bytes)
      .find(_.name == "query").flatMap(_.kv.get("context"))
      .getOrElse(throw new IllegalStateException(
        "query metadata not found"))
    s"""{"explain":$ctx}"""
  }

  /** /export with MCAP serialization: ordered multi-topic merge →
    * multiplexed MCAP. */
  def exportMcap(spark: SparkSession, topics: Seq[String],
      dataCols: Seq[String]): Array[Byte] =
    Export.mcap(export(spark, topics), dataCols)
}
