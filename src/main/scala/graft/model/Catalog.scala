package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A catalog of "message tables" — the dp3 data model re-expressed on
  * Spark (reference: server/treemgr/treemgr.go:29-33 — a table is a
  * (producer, topic) pair).
  *
  * A scan returns a DataFrame with at least the canonical columns
  *   producer: string, topic: string, time: long (epoch ns),
  *   seq: long (ingest sequence)
  * plus any decoded payload columns. The dp3 time-partitioned COW tree
  * becomes a columnar layout whose pruning Catalyst performs from
  * parquet min/max + partition values; at 100 TB the ingest path
  * (graft.streaming.Ingest) lays data out bucketed by (topic, day) so
  * scans of one (producer, topic, time range) touch only matching
  * files.
  */
trait MessageCatalog {

  /** Scan one topic across all producers. The planner adds producer,
    * time-range, and field predicates on top — Catalyst pushes them
    * into the scan (reference walks its tree instead:
    * server/tree/iterator.go:148-199). One topic-wide scan keeps the
    * compiled plan O(1) in the producer count; a per-producer scan API
    * would force `from *` into thousands of plan branches. */
  def scanTopic(spark: SparkSession, topic: String): DataFrame

  /** Convenience: one (producer, topic) table. */
  def scan(spark: SparkSession, producer: String, topic: String): DataFrame =
    scanTopic(spark, topic).where(
      org.apache.spark.sql.functions.col("producer") === producer)

  /** Producers that own any of the given topics — backs `from *`
    * (reference: server/plan/plan.go:366-400). */
  def producers(spark: SparkSession, topics: Seq[String]): Seq[String]

  /** Minimum retained version per (producer, topic) — data at or below
    * is invisible (reference truncation: server/tree/iterator.go:175).
    * Default: nothing truncated. */
  def truncationVersion(producer: String, topic: String): Long = -1L
}

/** Catalog over the driver testdata `events` table, interpreted as a
  * message log: topic = event_type, producer = "p" + user_id,
  * time = ts (epoch ns), seq = event_id. The JSON `props` payload is
  * decoded to a typed column `k` — the analogue of dp3's lazy field
  * decoding of nested message payloads
  * (reference: server/util/schema/parser.go:551-589).
  */
final class EventsCatalog(sfDir: String) extends MessageCatalog
    with Serializable {

  def messages(spark: SparkSession): DataFrame = {
    // events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) and
    // TIMESTAMP(MICROS) across testdata generations — adapt to what is
    // on disk rather than assuming one. dp3 is nanosecond-native
    // (server/treemgr/treemgr.go time axis), so the canonical `time`
    // column is epoch ns either way; `time_us` is the µs view every
    // oracle-facing output uses (DuckDB's epoch_us(ts)).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.types.LongType
    val (timeNs, timeUs) = raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) surfaced as raw ns long
        (col("ts").cast("long"), expr("ts div 1000"))
      case _ => // TIMESTAMP / TIMESTAMP_NTZ (µs); session tz is UTC,
        // so the NTZ→TZ cast is the identity epoch mapping
        val us = unix_micros(col("ts").cast("timestamp"))
        (us * lit(1000L), us)
    }
    raw.select(
      concat(lit("p"), col("user_id").cast("string")).as("producer"),
      col("event_type").as("topic"),
      timeNs.as("time"),
      timeUs.as("time_us"),
      col("event_id").as("seq"),
      col("value"),
      col("props"),
      // decoded payload field (props = {"k": <int>})
      regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
        .cast("long").as("k")
    )
  }

  override def scanTopic(spark: SparkSession, topic: String): DataFrame =
    messages(spark).where(col("topic") === topic)

  override def producers(spark: SparkSession,
      topics: Seq[String]): Seq[String] = {
    // catalog lookup; small + cachable. In a production layout this is a
    // control table, not a scan (reference: server/rootmap/sqlrootmap.go:427).
    messages(spark)
      .where(col("topic").isin(topics: _*))
      .select("producer").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
  }
}

/** Catalog over an arbitrary pre-shaped DataFrame holding the canonical
  * columns — used by tests to replay the reference's synthetic fixtures.
  */
final class DataFrameCatalog(df: DataFrame) extends MessageCatalog {
  override def scanTopic(spark: SparkSession, topic: String): DataFrame =
    df.where(col("topic") === topic)

  override def producers(spark: SparkSession,
      topics: Seq[String]): Seq[String] =
    df.where(col("topic").isin(topics: _*))
      .select("producer").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
}

/** Catalog with one (possibly differently-shaped) DataFrame per topic —
  * models dp3's per-table trees where schemas ride with the data and a
  * topic's schema is discovered at scan time (reference:
  * server/executor/expression.go:17-34). */
final class TopicMapCatalog(topics: Map[String, DataFrame])
    extends MessageCatalog {
  override def scanTopic(spark: SparkSession, topic: String): DataFrame =
    topics.getOrElse(topic, throw new IllegalArgumentException(
      s"no such topic '$topic'"))

  override def producers(spark: SparkSession,
      ts: Seq[String]): Seq[String] =
    ts.flatMap(t => topics.get(t).toSeq)
      .map(_.select(col("producer")).distinct())
      .reduce(_.union(_))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
}

/** Catalog over a directory produced by `Ingest.startWithStats`:
  * day-partitioned data plus the append-only stats and control tables.
  * Producer discovery reads the kilobyte-scale control table — the
  * reference's rootmap lookup (server/rootmap/sqlrootmap.go:427-461) —
  * so `from *` planning touches no event data at any scale. */
final class IngestedCatalog(dataDir: String, statsDir: String,
    controlDir: String, fieldStatsDir: Option[String] = None)
    extends MessageCatalog with Serializable {

  def messages(spark: SparkSession): DataFrame =
    spark.read.parquet(dataDir)

  def stats(spark: SparkSession): DataFrame =
    spark.read.parquet(statsDir)

  /** Per-field stat partials (`Ingest.startWithStats` with
    * `fieldStats`) — the statfilter's pruning source. */
  def fieldStats: Option[SparkSession => DataFrame] =
    fieldStatsDir.map(d => (s: SparkSession) => s.read.parquet(d))

  def control(spark: SparkSession): DataFrame =
    spark.read.parquet(controlDir)

  override def scanTopic(spark: SparkSession, topic: String): DataFrame =
    messages(spark).where(col("topic") === topic)

  override def producers(spark: SparkSession,
      topics: Seq[String]): Seq[String] =
    control(spark)
      .where(col("topic").isin(topics: _*))
      .select("producer").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
}

/** Plain loaders for the TPC-H-ish driver tables. */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
