package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Scan one topic with time bounds `[startNs, endNs)` applied where
    * the catalog can push them to the SOURCE. The default filters the
    * canonical `time` column — already pushable when `time` is a
    * physical column (IngestedCatalog's parquet layout). Catalogs whose
    * `time` is DERIVED from a raw on-disk column must override and
    * filter the raw column before projection, or Catalyst cannot turn
    * the bound into a parquet row-group prune — and at 100 TB the
    * time-range prune IS the engine (reference tree descent:
    * server/tree/iterator.go:148-199). */
  def scanTopic(spark: SparkSession, topic: String,
      between: Option[(Long, Long)]): DataFrame =
    between.foldLeft(scanTopic(spark, topic)) { case (df, (s, t)) =>
      df.where(org.apache.spark.sql.functions.col("time") >= s &&
        org.apache.spark.sql.functions.col("time") < t)
    }

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
  import EventsCatalog._

  /** How `ts` is encoded ON DISK, from the parquet footer's logical
    * type annotation. The Spark-surfaced schema cannot distinguish
    * TIMESTAMP(NANOS) (a LongType only because nanosAsLong is set)
    * from a plain BIGINT of some other unit, so keying behavior off
    * the footer is the only non-guessing option. Read once per
    * catalog instance (a footer, not data), with the SESSION's Hadoop
    * conf — a bare `new Configuration()` would make the footer probe
    * fail on any filesystem needing session config (s3a credentials,
    * custom defaultFS) even though the subsequent spark.read of the
    * same path succeeds. */
  @transient @volatile private var tsEncCache: TsEncoding = _
  private def encoding(spark: SparkSession): TsEncoding = {
    if (tsEncCache == null)
      tsEncCache = readTsEncoding(s"$sfDir/events.parquet",
        spark.sessionState.newHadoopConf())
    tsEncCache
  }
  private def tsEnc: TsEncoding = {
    val e = tsEncCache
    require(e != null,
      "ts encoding not resolved yet — call through a path that " +
        "passes the SparkSession (messages/scanTopic) first")
    e
  }

  private def rawEvents(spark: SparkSession): DataFrame = {
    if (encoding(spark) == TsNanosLong)
      // required for the read to SUCCEED on TIMESTAMP(NANOS) files
      // (Spark otherwise rejects the type); a no-op conf for µs data,
      // so only set when the footer proves it's needed.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    else
      // µs path epoch-maps NTZ values through the session zone: the
      // identity mapping ONLY under UTC. Every entry point sets it;
      // assert so the invariant travels with the code relying on it.
      require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
        "EventsCatalog requires spark.sql.session.timeZone=UTC " +
          s"(got ${spark.conf.get("spark.sql.session.timeZone")})")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  /** Canonical projection. dp3 is nanosecond-native
    * (server/treemgr/treemgr.go time axis), so `time` is epoch ns
    * whatever the disk unit; `time_us` is the µs view every
    * oracle-facing output uses (DuckDB's epoch_us(ts)). */
  private def project(raw: DataFrame): DataFrame = {
    val (timeNs, timeUs) = tsEnc match {
      case TsNanosLong => // surfaced as raw ns long
        (col("ts").cast("long"), expr("ts div 1000"))
      case TsMicrosNtz | TsMicrosUtc =>
        // session tz asserted UTC, so NTZ→TZ cast is identity epoch map
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

  def messages(spark: SparkSession): DataFrame = project(rawEvents(spark))

  /** Time bounds on the RAW `ts` column — a bare-attribute comparison
    * Catalyst turns into parquet PushedFilters (row-group + page
    * pruning), unlike a predicate on the derived `time` column, which
    * it cannot invert through `unix_micros(cast(ts))*1000`. Exact, not
    * an over-approximation: µs-grain `time` values are multiples of
    * 1000, so `time >= s` ⇔ `us >= ceil(s/1000)` and `time < t` ⇔
    * `us < ceil(t/1000)`. */
  private def tsBetween(startNs: Long, endNs: Long): Column = {
    def ceilUs(ns: Long) = -Math.floorDiv(-ns, 1000L)
    tsEnc match {
      case TsNanosLong =>
        col("ts") >= startNs && col("ts") < endNs
      case TsMicrosNtz => // TimestampNTZType: LocalDateTime literal
        def l(us: Long) = lit(java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC))
        col("ts") >= l(ceilUs(startNs)) && col("ts") < l(ceilUs(endNs))
      case TsMicrosUtc => // TimestampType: Instant literal
        def l(us: Long) = lit(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
        col("ts") >= l(ceilUs(startNs)) && col("ts") < l(ceilUs(endNs))
    }
  }

  override def scanTopic(spark: SparkSession, topic: String): DataFrame =
    scanTopic(spark, topic, None)

  override def scanTopic(spark: SparkSession, topic: String,
      between: Option[(Long, Long)]): DataFrame = {
    val raw = rawEvents(spark)
    val bounded = between.foldLeft(raw) { case (df, (s, t)) =>
      df.where(tsBetween(s, t))
    }
    project(bounded).where(col("topic") === topic)
  }

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

object EventsCatalog {
  /** The on-disk encodings `events.ts` has shipped with across testdata
    * generations. Anything else is a hard error, not a guess (a silent
    * 1000× time misread is worse than a crash). */
  private[model] sealed trait TsEncoding
  private[model] case object TsNanosLong  extends TsEncoding // TIMESTAMP(NANOS)
  private[model] case object TsMicrosNtz  extends TsEncoding // TIMESTAMP(MICROS), naive
  private[model] case object TsMicrosUtc  extends TsEncoding // TIMESTAMP(MICROS), UTC-adjusted

  private[model] def readTsEncoding(path: String,
      conf: org.apache.hadoop.conf.Configuration): TsEncoding = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
      else p
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val ann = reader.getFooter.getFileMetaData.getSchema
        .getType(Seq("ts"): _*).asPrimitiveType.getLogicalTypeAnnotation
      ann match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.NANOS => TsNanosLong
            case LogicalTypeAnnotation.TimeUnit.MICROS =>
              if (t.isAdjustedToUTC) TsMicrosUtc else TsMicrosNtz
            case u => throw new IllegalStateException(
              s"events.ts: unsupported parquet timestamp unit $u")
          }
        case other => throw new IllegalStateException(
          s"events.ts is not a parquet TIMESTAMP (annotation: $other)")
      }
    } finally reader.close()
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
