package graft.tools

import java.io.PrintStream
import java.time.Instant

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Storage inspection — the reference's `treeinspect` / `walinspect`
  * admin verbs (reference: cli/cmd/treeinspect.go:89-160 walks tree
  * nodes printing per-node time ranges / message counts / byte sizes;
  * cli/cmd/walinspect.go:22-58 lists pending WAL records) re-expressed
  * against this engine's physical layer.
  *
  * The tree here is the day-partitioned parquet layout, so the node
  * walk becomes a parquet FOOTER walk: one row per row group with its
  * time range, row count, and byte size read from column-chunk
  * metadata only — no data pages are touched, which is what makes
  * inspection viable on a 100 TB store (footers are ~KB per file; the
  * reads fan out over executors, one task per file batch). The WAL is
  * Structured Streaming's checkpoint log, so `walinspect` becomes an
  * offsets/commits listing: an offsets entry without a matching commit
  * is exactly the reference's "merge requested, not completed" state.
  */
object Inspect {

  private val RowGroupSchema = StructType(Seq(
    StructField("file", StringType),
    StructField("topic", StringType),
    StructField("day", LongType),
    StructField("row_group", IntegerType),
    StructField("rows", LongType),
    StructField("bytes", LongType),
    StructField("time_min", LongType),
    StructField("time_max", LongType),
    StructField("producer_min", StringType),
    StructField("producer_max", StringType),
    StructField("version_min", LongType),
    StructField("version_max", LongType)))

  /** One row per parquet row group under `dataDir`, from footers only.
    * `topic`/`day` are parsed from the partition path when present
    * (the `Ingest` layout); min/max columns come from column-chunk
    * statistics and are null when the column is absent or the writer
    * kept no stats. File listing happens on the driver (metadata, like
    * the reference's rootmap read); footer decoding is distributed. */
  def rowGroups(spark: SparkSession, dataDir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dataDir)
    val fs = root.getFileSystem(conf)
    val it = fs.listFiles(root, true)
    val paths = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next().getPath)
      .filter(p => p.getName.endsWith(".parquet")
        && !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .map(_.toString).toArray.sorted
    // Configuration is not serializable: ship it as key/value pairs
    // and rebuild per partition (covers s3a credentials etc.)
    val confKv = conf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val rootStr = fs.makeQualified(root).toString
    val slices = math.max(1, math.min(paths.length, 64))
    val rows = spark.sparkContext.parallelize(paths.toSeq, slices)
      .mapPartitions { ps =>
        val c = new Configuration(false)
        confKv.foreach { case (k, v) => c.set(k, v) }
        ps.flatMap(p => footerRows(c, p, rootStr))
      }
    spark.createDataFrame(rows, RowGroupSchema)
  }

  private def footerRows(conf: Configuration, path: String,
      root: String): Seq[Row] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), conf))
    try {
      val rel = path.stripPrefix(root).stripPrefix("/")
      val topic = "topic=([^/]+)/".r.findFirstMatchIn(rel)
        .map(_.group(1)).orNull
      val day = "day=(-?\\d+)/".r.findFirstMatchIn(rel)
        .map(m => Long.box(m.group(1).toLong)).orNull
      reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map {
        case (b, i) =>
          val cols = b.getColumns.asScala
            .map(c => c.getPath.toDotString -> c).toMap
          def stat(name: String, min: Boolean): Option[Any] =
            cols.get(name).flatMap { c =>
              val s = c.getStatistics
              if (s == null || !s.hasNonNullValue) None
              else Option(if (min) s.genericGetMin else s.genericGetMax)
            }
          def longStat(name: String, min: Boolean): Any =
            stat(name, min).map {
              case l: java.lang.Long => l
              case n: java.lang.Number => Long.box(n.longValue())
            }.orNull
          def textStat(name: String, min: Boolean): Any =
            stat(name, min).map {
              case bin: Binary => bin.toStringUsingUTF8
              case other => other.toString
            }.orNull
          Row(rel, topic, day, i, b.getRowCount, b.getCompressedSize,
            longStat("time", min = true), longStat("time", min = false),
            textStat("producer", min = true),
            textStat("producer", min = false),
            longStat("ingest_version", min = true),
            longStat("ingest_version", min = false))
      }
    } finally reader.close()
  }

  /** Print the `treeinspect`-style indented hierarchy:
    * topic → day → file → row group, each line carrying its time range
    * + rows + bytes (reference: cli/cmd/treeinspect.go:104-147 prints
    * inner nodes as `object [start end]` and leaves as
    * `[start end] size, N messages`). Collects the row-group frame —
    * metadata-sized, one row per row group. */
  def printTree(spark: SparkSession, dataDir: String,
      out: PrintStream, topicFilter: Option[String] = None): Unit = {
    def fmt(ns: Any): String = ns match {
      case l: java.lang.Long =>
        Instant.ofEpochSecond(l / 1000000000L).toString
      case _ => "?"
    }
    def human(bytes: Long): String =
      if (bytes >= (1L << 20)) f"${bytes / 1048576.0}%.1f MiB"
      else if (bytes >= (1L << 10)) f"${bytes / 1024.0}%.1f KiB"
      else s"$bytes B"
    val all = rowGroups(spark, dataDir).collect()
      .filter(r => topicFilter.forall(_ == r.getAs[String]("topic")))
    for ((topic, tRows) <- all.groupBy(_.getAs[String]("topic")).toSeq
        .sortBy(_._1.toString)) {
      out.println(s"topic=$topic")
      val byDay = tRows.groupBy(r => Option(r.getAs[java.lang.Long]("day")))
      for ((day, dRows) <- byDay.toSeq.sortBy(_._1.map(_.toLong))) {
        val rows = dRows.map(_.getAs[Long]("rows")).sum
        val bytes = dRows.map(_.getAs[Long]("bytes")).sum
        val tmins = dRows.map(_.get(6)).collect { case l: java.lang.Long => l.toLong }
        val tmaxs = dRows.map(_.get(7)).collect { case l: java.lang.Long => l.toLong }
        out.println(s"  day=${day.getOrElse("?")} " +
          s"[${fmt(tmins.minOption.map(Long.box).orNull)} " +
          s"${fmt(tmaxs.maxOption.map(Long.box).orNull)}] " +
          s"${dRows.map(_.getString(0)).distinct.length} files, " +
          s"${human(bytes)}, $rows rows")
        for (r <- dRows.sortBy(r => (r.getString(0), r.getInt(3)))) {
          val vmin = r.get(10); val vmax = r.get(11)
          val vers = if (vmin == null) ""
            else if (vmin == vmax) s" v$vmin" else s" v$vmin..$vmax"
          out.println(s"    ${r.getString(0).split('/').last} " +
            s"rg${r.getInt(3)} [${fmt(r.get(6))} ${fmt(r.get(7))}] " +
            s"${human(r.getAs[Long]("bytes"))}, " +
            s"${r.getAs[Long]("rows")} rows$vers")
        }
      }
    }
  }

  /** One planned micro-batch in a Structured-Streaming checkpoint —
    * the WAL record of this engine. `committed = false` is the
    * reference's "merge request without merge complete"
    * (cli/cmd/walinspect.go:44-55): the batch was planned (offsets
    * written) but its outputs are not yet durable; restart replays it. */
  final case class BatchInfo(id: Long, committed: Boolean,
      watermarkMs: Option[Long], sourceOffsets: Seq[String])

  /** List the checkpoint's batches oldest-first by reading the
    * offsets/ and commits/ logs (text files: "v1" header, metadata
    * JSON, then one offset line per source). Uses the Hadoop FS API so
    * checkpoint dirs on object storage inspect the same way. */
  def checkpoint(dir: String,
      conf: Configuration = new Configuration()): Seq[BatchInfo] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    def entries(sub: String): Map[Long, Path] = {
      val p = new Path(root, sub)
      if (!fs.exists(p)) Map.empty
      else fs.listStatus(p).toSeq
        .flatMap(s => s.getPath.getName.toLongOption.map(_ -> s.getPath))
        .toMap
    }
    val commits = entries("commits").keySet
    entries("offsets").toSeq.sortBy(_._1).map { case (id, p) =>
      val in = fs.open(p)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList finally in.close()
      val wm = lines.drop(1).headOption.flatMap(
        "\"batchWatermarkMs\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(_))
        .map(_.group(1).toLong)
      BatchInfo(id, commits.contains(id), wm, lines.drop(2))
    }
  }

  /** Print the `walinspect`-style listing: one line per batch with its
    * commit state and per-source offsets. */
  def printCheckpoint(dir: String, out: PrintStream,
      conf: Configuration = new Configuration()): Unit =
    checkpoint(dir, conf).foreach { b =>
      val state = if (b.committed) "committed" else "PENDING"
      val wm = b.watermarkMs.map(w => s" watermark=${w}ms").getOrElse("")
      out.println(s"batch ${b.id}: $state$wm " +
        s"offsets: ${b.sourceOffsets.mkString("; ")}")
    }
}
