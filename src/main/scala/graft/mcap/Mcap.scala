package graft.mcap

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MCAP container support — the PUBLIC MCAP spec (https://mcap.dev/spec)
  * subset the reference reads and writes: magic, Header(0x01),
  * Schema(0x03), Channel(0x04), Message(0x05), Chunk(0x06),
  * DataEnd(0x0F), Footer(0x02), with zstd / lz4 / uncompressed chunks.
  * The reference's default output is chunked zstd (4 MiB chunks,
  * reference: server/mcap/mcap.go:50-66, zstd at :23-41), so the writer
  * defaults match; index/summary records (MessageIndex, ChunkIndex,
  * Statistics, SummaryOffset) are skipped on read — this reader scans
  * linearly, like the official readers do when unindexed.
  *
  * All integers little-endian; record = opcode u8 + length u64 +
  * payload; string = u32 length + bytes.
  */
object Mcap {

  val Magic: Array[Byte] =
    Array(0x89.toByte, 'M', 'C', 'A', 'P', '0', '\r', '\n')

  final case class SchemaRec(id: Int, name: String, encoding: String,
      data: Array[Byte])
  final case class ChannelRec(id: Int, schemaId: Int, topic: String,
      messageEncoding: String)
  final case class MessageRec(channelId: Int, sequence: Long,
      logTime: Long, publishTime: Long, data: Array[Byte])

  // --- writer ------------------------------------------------------------

  /** Chunked-by-default writer mirroring the reference's defaults
    * (Chunked: true, ChunkSize: 4 MiB, Compression: zstd —
    * server/mcap/mcap.go:50-66). Schema/channel records are written
    * into the chunk stream, which the spec allows and official writers
    * do. `compression` ∈ {"zstd", "lz4", ""}. */
  final class Writer(chunked: Boolean = true,
      compression: String = "zstd", chunkSize: Int = 4 << 20) {
    private val out = new ByteArrayOutputStream()
    out.write(Magic)
    writeRecord(out, 0x01, { b => str(b, "graft"); str(b, "") })

    private val chunkBuf = new ByteArrayOutputStream()
    private var msgStart = Long.MaxValue
    private var msgEnd = 0L

    private def writeRecord(dst: ByteArrayOutputStream, op: Int,
        fill: ByteArrayOutputStream => Unit): Unit = {
      val body = new ByteArrayOutputStream()
      fill(body)
      val payload = body.toByteArray
      dst.write(op)
      dst.write(u64(payload.length.toLong))
      dst.write(payload)
    }

    private def record(op: Int, fill: ByteArrayOutputStream => Unit)
        : Unit =
      if (chunked) {
        writeRecord(chunkBuf, op, fill)
        if (chunkBuf.size() >= chunkSize) flushChunk()
      } else writeRecord(out, op, fill)

    private def flushChunk(): Unit = {
      if (chunkBuf.size() == 0) return
      val raw = chunkBuf.toByteArray
      chunkBuf.reset()
      val compressed = Compression.compress(compression, raw)
      writeRecord(out, 0x06, { b =>
        b.write(u64(if (msgStart == Long.MaxValue) 0L else msgStart))
        b.write(u64(msgEnd))
        b.write(u64(raw.length.toLong))
        b.write(u32(0L)) // uncompressed_crc = 0: not computed (spec-legal)
        str(b, compression)
        b.write(u64(compressed.length.toLong))
        b.write(compressed)
      })
      msgStart = Long.MaxValue
      msgEnd = 0L
    }

    private def u16(v: Int): Array[Byte] =
      ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
        .putShort(v.toShort).array()
    private def u32(v: Long): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v.toInt).array()
    private def u64(v: Long): Array[Byte] =
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(v).array()
    private def str(b: ByteArrayOutputStream, s: String): Unit = {
      val bytes = s.getBytes(UTF_8)
      b.write(u32(bytes.length.toLong)); b.write(bytes)
    }

    def writeSchema(s: SchemaRec): Unit = record(0x03, { b =>
      b.write(u16(s.id)); str(b, s.name); str(b, s.encoding)
      b.write(u32(s.data.length.toLong)); b.write(s.data)
    })

    def writeChannel(c: ChannelRec): Unit = record(0x04, { b =>
      b.write(u16(c.id)); b.write(u16(c.schemaId)); str(b, c.topic)
      str(b, c.messageEncoding)
      b.write(u32(0L)) // empty metadata map (byte length 0)
    })

    def writeMessage(m: MessageRec): Unit = {
      msgStart = math.min(msgStart, m.logTime)
      msgEnd = math.max(msgEnd, m.logTime)
      record(0x05, { b =>
        b.write(u16(m.channelId)); b.write(u32(m.sequence))
        b.write(u64(m.logTime)); b.write(u64(m.publishTime))
        b.write(m.data)
      })
    }

    // (offset, length, name) of each Metadata record, for the
    // MetadataIndex records finish() writes into the summary section
    private val metadataIndex =
      scala.collection.mutable.Buffer[(Long, Long, String)]()

    /** Metadata(0x0C): name + string→string map — how the reference
      * ships per-node execution stats in-band with explain query
      * output (server/executor/executor.go:87-94 WriteMetadata).
      * Written at the top level of the data section (current chunk is
      * flushed first so record order is preserved), with offset/length
      * captured so finish() can emit the MetadataIndex(0x0D) records
      * official readers use to find it without a linear scan. */
    def writeMetadata(name: String, kv: Seq[(String, String)]): Unit = {
      if (chunked) flushChunk()
      val offset = out.size().toLong
      writeRecord(out, 0x0C, { b =>
        str(b, name)
        val map = new ByteArrayOutputStream()
        kv.foreach { case (k, v) => str(map, k); str(map, v) }
        val mb = map.toByteArray
        b.write(u32(mb.length.toLong)); b.write(mb)
      })
      metadataIndex += ((offset, out.size().toLong - offset, name))
    }

    def finish(): Array[Byte] = {
      if (chunked) flushChunk()
      writeRecord(out, 0x0F, b => b.write(u32(0L))) // DataEnd(crc=0)
      // summary section: one MetadataIndex(0x0D) per metadata record;
      // footer's summary_start points at it (0 = no summary, as before)
      val summaryStart =
        if (metadataIndex.isEmpty) 0L else out.size().toLong
      metadataIndex.foreach { case (off, len, name) =>
        writeRecord(out, 0x0D, { b =>
          b.write(u64(off)); b.write(u64(len)); str(b, name)
        })
      }
      writeRecord(out, 0x02, { b =>                  // Footer
        b.write(u64(summaryStart)); b.write(u64(0L)); b.write(u32(0L))
      })
      out.write(Magic)
      out.toByteArray
    }
  }

  /** zstd via zstd-jni and lz4 frame format via lz4-java — both ship
    * with Spark (parquet/shuffle codecs), no extra dependency. */
  private object Compression {
    def compress(name: String, raw: Array[Byte]): Array[Byte] =
      name match {
        case "" => raw
        case "zstd" => com.github.luben.zstd.Zstd.compress(raw)
        case "lz4" =>
          val bos = new ByteArrayOutputStream()
          val s = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
          s.write(raw); s.close()
          bos.toByteArray
        case other =>
          throw new IllegalArgumentException(
            s"unsupported chunk compression '$other'")
      }

    def decompress(name: String, data: Array[Byte],
        uncompressedSize: Int): Array[Byte] = name match {
      case "" => data
      case "zstd" =>
        com.github.luben.zstd.Zstd.decompress(data, uncompressedSize)
      case "lz4" =>
        val in = new net.jpountz.lz4.LZ4FrameInputStream(
          new java.io.ByteArrayInputStream(data))
        val outB = new Array[Byte](uncompressedSize)
        var off = 0
        var n = 0
        while (off < uncompressedSize && n >= 0) {
          n = in.read(outB, off, uncompressedSize - off)
          if (n > 0) off += n
        }
        in.close()
        require(off == uncompressedSize,
          s"lz4 chunk truncated: $off of $uncompressedSize bytes")
        outB
      case other =>
        throw new IllegalArgumentException(
          s"unsupported chunk compression '$other'")
    }
  }

  // --- reader ------------------------------------------------------------

  final case class Decoded(topic: String, schemaName: String,
      sequence: Long, logTime: Long, publishTime: Long, data: Array[Byte])

  def read(bytes: Array[Byte]): Iterator[Decoded] = {
    require(bytes.length > 16 &&
      bytes.take(8).sameElements(Magic), "not an MCAP file")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(8)
    records(buf,
      scala.collection.mutable.Map[Int, SchemaRec](),
      scala.collection.mutable.Map[Int, ChannelRec]())
  }

  /** Linear record scan; chunks decompress and recurse on the inner
    * record stream (schema/channel state is shared, so definitions in
    * one chunk resolve messages in later ones). */
  private def records(buf: ByteBuffer,
      schemas: scala.collection.mutable.Map[Int, SchemaRec],
      channels: scala.collection.mutable.Map[Int, ChannelRec])
      : Iterator[Decoded] = {
    val out = Iterator.unfold(()) { _ =>
      if (buf.remaining() < 9) None
      else {
        val op = buf.get() & 0xff
        val len = buf.getLong()
        if (op == 0x02 || buf.remaining() < len) None // footer / truncated
        else {
          val end = buf.position() + len.toInt
          val res: Iterator[Decoded] = op match {
            case 0x03 =>
              val id = buf.getShort() & 0xffff
              val name = readStr(buf); val enc = readStr(buf)
              val dlen = buf.getInt()
              val d = new Array[Byte](dlen); buf.get(d)
              schemas(id) = SchemaRec(id, name, enc, d); Iterator.empty
            case 0x04 =>
              val id = buf.getShort() & 0xffff
              val sid = buf.getShort() & 0xffff
              val topic = readStr(buf); val menc = readStr(buf)
              channels(id) = ChannelRec(id, sid, topic, menc)
              Iterator.empty
            case 0x05 =>
              val cid = buf.getShort() & 0xffff
              val seq = buf.getInt().toLong & 0xffffffffL
              val lt = buf.getLong(); val pt = buf.getLong()
              val d = new Array[Byte](end - buf.position()); buf.get(d)
              val ch = channels.getOrElse(cid,
                throw new IllegalStateException(s"unknown channel $cid"))
              val schemaName =
                schemas.get(ch.schemaId).map(_.name).getOrElse("")
              Iterator.single(
                Decoded(ch.topic, schemaName, seq, lt, pt, d))
            case 0x06 =>
              buf.getLong(); buf.getLong() // message start/end time
              val usize = buf.getLong()
              buf.getInt()                 // uncompressed_crc (unchecked)
              val comp = readStr(buf)
              val rlen = buf.getLong()
              val cdata = new Array[Byte](rlen.toInt); buf.get(cdata)
              val raw = Compression.decompress(comp, cdata, usize.toInt)
              records(
                ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN),
                schemas, channels)
            case _ => Iterator.empty // header, indexes, data end: skip
          }
          buf.position(end)
          Some((res, ()))
        }
      }
    }
    out.flatten
  }

  private def readStr(buf: ByteBuffer): String = {
    val n = buf.getInt()
    val b = new Array[Byte](n); buf.get(b)
    new String(b, UTF_8)
  }

  final case class MetadataRec(name: String, kv: Map[String, String])

  /** All Metadata(0x0C) records of a stream, top level and inside
    * chunks, in order — the read-back side of
    * [[Writer.writeMetadata]], serving the reference's explain
    * round-trip (server/routes/query.go:53-90 reads the "query"
    * metadata record out of the MCAP result to answer an explain
    * request). Linear scan, like [[read]]. */
  def readMetadata(bytes: Array[Byte]): Seq[MetadataRec] = {
    require(bytes.length > 16 &&
      bytes.take(8).sameElements(Magic), "not an MCAP file")
    val out = scala.collection.mutable.Buffer[MetadataRec]()
    def scan(buf: ByteBuffer): Unit = {
      var stop = false
      while (!stop && buf.remaining() >= 9) {
        val op = buf.get() & 0xff
        val len = buf.getLong()
        if (op == 0x02 || buf.remaining() < len) stop = true
        else {
          val end = buf.position() + len.toInt
          op match {
            case 0x0C =>
              val name = readStr(buf)
              val mapLen = buf.getInt()
              val mapEnd = buf.position() + mapLen
              val kv = scala.collection.mutable.LinkedHashMap[String, String]()
              while (buf.position() < mapEnd)
                kv(readStr(buf)) = readStr(buf)
              out += MetadataRec(name, kv.toMap)
            case 0x06 =>
              buf.getLong(); buf.getLong()
              val usize = buf.getLong()
              buf.getInt()
              val comp = readStr(buf)
              val rlen = buf.getLong()
              val cdata = new Array[Byte](rlen.toInt); buf.get(cdata)
              scan(ByteBuffer.wrap(
                  Compression.decompress(comp, cdata, usize.toInt))
                .order(ByteOrder.LITTLE_ENDIAN))
            case _ => ()
          }
          buf.position(end)
        }
      }
    }
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(8)
    scan(buf)
    out.toSeq
  }

  /** Schema records of one MCAP stream, in definition order (chunks
    * recursed) — the input side of a schema registry keyed by content
    * hash (reference: server/schemastore/schemastore.go keyed by the
    * schema hash the /schemas/{hash} route serves). */
  def readSchemaRecs(bytes: Array[Byte]): Seq[SchemaRec] = {
    require(bytes.length > 16 &&
      bytes.take(8).sameElements(Magic), "not an MCAP file")
    val out = scala.collection.mutable.LinkedHashMap[Int, SchemaRec]()
    def scan(buf: ByteBuffer): Unit = {
      var stop = false
      while (!stop && buf.remaining() >= 9) {
        val op = buf.get() & 0xff
        val len = buf.getLong()
        if (op == 0x02 || buf.remaining() < len) stop = true
        else {
          val end = buf.position() + len.toInt
          op match {
            case 0x03 =>
              val id = buf.getShort() & 0xffff
              val name = readStr(buf); val enc = readStr(buf)
              val dlen = buf.getInt()
              val d = new Array[Byte](dlen); buf.get(d)
              out(id) = SchemaRec(id, name, enc, d)
            case 0x06 =>
              buf.getLong(); buf.getLong()
              val usize = buf.getLong()
              buf.getInt()
              val comp = readStr(buf)
              val rlen = buf.getLong()
              val cdata = new Array[Byte](rlen.toInt); buf.get(cdata)
              scan(ByteBuffer.wrap(
                  Compression.decompress(comp, cdata, usize.toInt))
                .order(ByteOrder.LITTLE_ENDIAN))
            case _ => ()
          }
          buf.position(end)
        }
      }
    }
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(8)
    scan(buf)
    out.values.toSeq
  }

  /** Distributed schema-registry source: every schema record in a
    * directory of MCAP files as (schema_hash, schema_name,
    * schema_encoding, schema_data), distinct by content. The hash is
    * md5 over (name, encoding, bytes) — deterministic and
    * engine-portable, serving the reference's /schemas/{hash} lookup. */
  def loadSchemas(spark: SparkSession, dir: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.mcap").load(dir)
      .select(col("content"))
    val schema = StructType(Seq(
      StructField("schema_name", StringType),
      StructField("schema_encoding", StringType),
      StructField("schema_data", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    files.mapPartitions { it =>
      it.flatMap { row =>
        readSchemaRecs(row.getAs[Array[Byte]](0))
          .map(s => Row(s.name, s.encoding, s.data))
      }
    }(enc)
      .withColumn("schema_hash", md5(concat(
        col("schema_name").cast("binary"), lit(Array[Byte](0)),
        col("schema_encoding").cast("binary"), lit(Array[Byte](0)),
        col("schema_data"))))
      .dropDuplicates("schema_hash")
      .select("schema_hash", "schema_name", "schema_encoding",
        "schema_data")
  }

  // --- Spark source ------------------------------------------------------

  val messageSchema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("producer", StringType),
    StructField("schema_name", StringType),
    StructField("seq", LongType),
    StructField("time", LongType),
    StructField("publish_time", LongType),
    StructField("data", BinaryType)))

  /** Decode the `data` payload column of a loaded message frame into a
    * `decoded` struct, dispatching on the MCAP schema encoding:
    * `ros1msg` payloads are packed little-endian ros1 serialization
    * ([[graft.ros1.Ros1Msg]]), `ros2msg` payloads are CDR/XCDR1 as
    * rosbag2 writes them ([[graft.ros2.Ros2Msg]]). The package (and for
    * ros2 the message name) come from the schema record's name —
    * `pkg/Name` for ros1, `pkg/msg/Name` for ros2 (rosbag2 also emits
    * the 2-segment form; both resolve). */
  def decodeDf(df: DataFrame, schema: SchemaRec,
      dataCol: String = "data"): DataFrame = {
    val definition = new String(schema.data, UTF_8)
    val segs = schema.name.split('/')
    schema.encoding match {
      case "ros1msg" =>
        graft.ros1.Ros1Msg.decodeDf(df, definition,
          dataCol = dataCol, pkg = segs.head)
      case "ros2msg" =>
        graft.ros2.Ros2Msg.decodeDf(df, definition,
          pkg = segs.head, name = segs.last, dataCol = dataCol)
      case other => throw new IllegalArgumentException(
        s"unsupported schema encoding '$other' for ${schema.name}")
    }
  }

  /** Distributed MCAP ingest: Spark's binaryFile source lists + ships
    * whole files (one per task — MCAP files are the reference's ingest
    * unit too), mapPartitions parses them into canonical message rows.
    * The producer is taken from the file name stem, matching the
    * reference's producer-per-import model
    * (reference: server/routes/import.go:31-59). */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.mcap").load(dir)
      .select(col("path"), col("content"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(messageSchema)
    files.mapPartitions { it =>
      it.flatMap { row =>
        val path = row.getString(0)
        val producer = path.split('/').last.stripSuffix(".mcap")
        read(row.getAs[Array[Byte]](1)).map { d =>
          Row(d.topic, producer, d.schemaName, d.sequence, d.logTime,
            d.publishTime, d.data)
        }
      }
    }(enc)
  }
}
