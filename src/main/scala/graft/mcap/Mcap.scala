package graft.mcap

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal MCAP container support — enough of the PUBLIC MCAP spec
  * (https://mcap.dev/spec) to round-trip the reference's data model:
  * magic, Header(0x01), Schema(0x03), Channel(0x04), Message(0x05),
  * DataEnd(0x0F), Footer(0x02). Un-chunked, no CRCs, no index — the
  * subset the reference itself writes in its test fixtures
  * (reference: server/mcap/testutils.go:39-130 writes via the official
  * writer; the record framing here follows the spec, not that code).
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

  final class Writer {
    private val out = new ByteArrayOutputStream()
    out.write(Magic)
    record(0x01, { b => str(b, "graft"); str(b, "") }) // Header(profile, library)

    private def record(op: Int, fill: ByteArrayOutputStream => Unit)
        : Unit = {
      val body = new ByteArrayOutputStream()
      fill(body)
      val payload = body.toByteArray
      out.write(op)
      out.write(u64(payload.length.toLong))
      out.write(payload)
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

    def writeMessage(m: MessageRec): Unit = record(0x05, { b =>
      b.write(u16(m.channelId)); b.write(u32(m.sequence))
      b.write(u64(m.logTime)); b.write(u64(m.publishTime))
      b.write(m.data)
    })

    def finish(): Array[Byte] = {
      record(0x0F, b => b.write(u32(0L)))        // DataEnd(crc=0)
      record(0x02, { b =>                         // Footer
        b.write(u64(0L)); b.write(u64(0L)); b.write(u32(0L))
      })
      out.write(Magic)
      out.toByteArray
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
    val schemas = scala.collection.mutable.Map[Int, SchemaRec]()
    val channels = scala.collection.mutable.Map[Int, ChannelRec]()
    val out = Iterator.unfold(()) { _ =>
      if (buf.remaining() < 9) None
      else {
        val op = buf.get() & 0xff
        val len = buf.getLong()
        if (op == 0x02 || buf.remaining() < len) None // footer / truncated
        else {
          val end = buf.position() + len.toInt
          val res: Option[Decoded] = op match {
            case 0x03 =>
              val id = buf.getShort() & 0xffff
              val name = readStr(buf); val enc = readStr(buf)
              val dlen = buf.getInt()
              val d = new Array[Byte](dlen); buf.get(d)
              schemas(id) = SchemaRec(id, name, enc, d); None
            case 0x04 =>
              val id = buf.getShort() & 0xffff
              val sid = buf.getShort() & 0xffff
              val topic = readStr(buf); val menc = readStr(buf)
              channels(id) = ChannelRec(id, sid, topic, menc); None
            case 0x05 =>
              val cid = buf.getShort() & 0xffff
              val seq = buf.getInt().toLong & 0xffffffffL
              val lt = buf.getLong(); val pt = buf.getLong()
              val d = new Array[Byte](end - buf.position()); buf.get(d)
              val ch = channels.getOrElse(cid,
                throw new IllegalStateException(s"unknown channel $cid"))
              val schemaName =
                schemas.get(ch.schemaId).map(_.name).getOrElse("")
              Some(Decoded(ch.topic, schemaName, seq, lt, pt, d))
            case _ => None // header, data end, anything else: skip
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

  // --- Spark source ------------------------------------------------------

  val messageSchema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("producer", StringType),
    StructField("schema_name", StringType),
    StructField("seq", LongType),
    StructField("time", LongType),
    StructField("publish_time", LongType),
    StructField("data", BinaryType)))

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
