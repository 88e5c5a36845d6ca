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

  /** feature-extraction output: one fixed-dim vector per payload */
  case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** Feature extraction: payload → fixed-dim float vector, the
    * embedding-extraction stage of a media pipeline (a real
    * implementation runs a vision/audio encoder here; the stub derives
    * a deterministic vector from the payload digest so the Spark-side
    * contract — schema `array<float>`, partition-local batch, fixed
    * dim — is real and the output plugs into [[Similarity]] as-is). */
  def extractFeatures(spark: SparkSession, df: DataFrame, dim: Int = 8,
      idCol: String = "doc_id"): Dataset[MediaFeatures] = {
    import spark.implicits._
    require(dim >= 1, "dim >= 1")
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // digest instance per partition, like a codec handle
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val d = md.digest(bytes)
          val fs = Array.tabulate(dim)(i => (d(i % d.length) & 0xff)
            / 255.0f)
          MediaFeatures(id, fs)
        }
      }
  }

  /** resize output: payload resampled to the target geometry */
  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** Resize: payload → payload of the target geometry via
    * nearest-index resampling on the byte plane (a real implementation
    * decodes, scales, re-encodes; the byte-plane resample keeps the
    * transform deterministic and the binary→binary partition-local
    * shape exact). Output payload length is `width·height`. */
  def resize(spark: SparkSession, df: DataFrame, width: Int, height: Int,
      idCol: String = "doc_id"): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(width >= 1 && height >= 1, "positive geometry")
    val n = width * height
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val out =
          if (bytes.isEmpty) new Array[Byte](n)
          else Array.tabulate(n)(i =>
            bytes((i.toLong * bytes.length / n).toInt))
        ResizedMedia(id, width, height, out)
      })
  }

  /** frame-sampling output: one row per kept frame (one-to-many) */
  case class Frame(doc_id: Long, frame_idx: Int,
      frame_payload: Array[Byte])

  /** Frame sampling: video payload → every `every`-th fixed-size
    * frame, exploded one row per frame — the one-to-many batch shape
    * (a real implementation seeks keyframes; the fixed-size chunking
    * keeps offsets deterministic). Frames keep their ORIGINAL index so
    * downstream joins can reconstruct timeline position. */
  def sampleFrames(spark: SparkSession, df: DataFrame, frameSize: Int,
      every: Int, idCol: String = "doc_id"): Dataset[Frame] = {
    import spark.implicits._
    require(frameSize >= 1 && every >= 1, "positive frame/stride")
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val frames = bytes.grouped(frameSize).zipWithIndex
        frames.collect {
          case (chunk, idx) if idx % every == 0 => Frame(id, idx, chunk)
        }
      })
  }
}
