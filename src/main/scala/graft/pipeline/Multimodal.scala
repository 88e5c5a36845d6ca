package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, with decode/feature-extraction as partition-local
  * operators.
  *
  * The media codecs themselves are NOT available in this environment,
  * so the decode step is a pluggable `MediaDecoder`; `StubDecoder` is a
  * deterministic fake (metadata derived from the bytes) that keeps the
  * Spark-side contract — schema, batch shape, partition locality —
  * real and testable. Swap in a real decoder (JNI/ffmpeg/ImageIO)
  * without touching the pipeline.
  *
  * Scale notes: decode runs via mapPartitions so codec init happens
  * once per partition, not per row; payloads never pass through a
  * shuffle (decode before any wide op, project metadata only); the
  * binary column stays out of ReadSchema unless referenced (columnar
  * pruning).
  */
object Multimodal {

  /** media row metadata produced by decode */
  case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      kind: String,
      width: Int,
      height: Int,
      checksum: String)

  trait MediaDecoder extends Serializable {
    /** called once per partition before decoding */
    def open(): Unit
    def decode(id: Long, payload: Array[Byte]): MediaMeta
    def close(): Unit
  }

  /** Deterministic fake: "decodes" metadata from the payload bytes.
    * A real implementation would parse image headers / frames here. */
  final class StubDecoder extends MediaDecoder {
    def open(): Unit = ()
    def close(): Unit = ()
    def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      val len = payload.length.toLong
      val first = if (payload.nonEmpty) payload(0) & 0xff else 0
      val kind = first % 3 match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"
      }
      MediaMeta(id, len, kind,
        width = 32 + first % 32,
        height = 32 + (len % 32).toInt,
        checksum = java.security.MessageDigest.getInstance("MD5")
          .digest(payload).map("%02x".format(_)).mkString)
    }
  }

  /** Attach a binary payload column (here: utf-8 of text — the driver
    * testdata has no real media; the pipeline shape is the point). */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", encode(col(textCol), "utf-8"))

  /** Partition-local decode: binary payload → typed metadata. */
  def decodeMeta(spark: SparkSession, df: DataFrame,
      decoder: MediaDecoder = new StubDecoder,
      idCol: String = "doc_id"): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        decoder.open()
        val out = it.map { case (id, bytes) => decoder.decode(id, bytes) }
        // NB: close() after iterator exhaustion would need a wrapper;
        // the stub has no resources
        out
      }
  }
}
