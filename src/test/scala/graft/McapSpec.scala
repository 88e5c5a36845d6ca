package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.mcap.Mcap

/** MCAP container round-trip + distributed ingest via the binaryFile
  * source. Mirrors the reference's standard fixture shape: one schema,
  * topics with caller-supplied timestamp sets
  * (reference: server/mcap/testutils.go:79-130).
  */
class McapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(w: Mcap.Writer = new Mcap.Writer): Array[Byte] = {
    w.writeSchema(Mcap.SchemaRec(1, "package/test", "ros1msg",
      "string data\nint16 count".getBytes))
    w.writeChannel(Mcap.ChannelRec(0, 1, "topic-0", "ros1"))
    w.writeChannel(Mcap.ChannelRec(1, 1, "topic-1", "ros1"))
    for (t <- Seq(1L, 3L, 5L))
      w.writeMessage(Mcap.MessageRec(0, t, t, t, s"m$t".getBytes))
    for (t <- Seq(2L, 4L, 6L))
      w.writeMessage(Mcap.MessageRec(1, t, t, t, s"m$t".getBytes))
    w.finish()
  }

  private def checkRoundTrip(bytes: Array[Byte]): Unit = {
    val msgs = Mcap.read(bytes).toSeq
    assert(msgs.map(m => (m.topic, m.logTime)) == Seq(
      ("topic-0", 1L), ("topic-0", 3L), ("topic-0", 5L),
      ("topic-1", 2L), ("topic-1", 4L), ("topic-1", 6L)))
    assert(msgs.forall(_.schemaName == "package/test"))
    assert(new String(msgs.head.data) == "m1")
  }

  test("writer/reader round-trip preserves messages and topics " +
      "(default: chunked zstd, the reference's output format)") {
    val bytes = fixture()
    // the payload really is inside a Chunk(0x06) record, not in the
    // clear: first top-level record after the Header must be a chunk
    val afterHeader = 8 + 9 + ("graft".length + 4) + 4
    assert((bytes(afterHeader) & 0xff) == 0x06, "expected Chunk record")
    checkRoundTrip(bytes)
  }

  test("round-trip: un-chunked, lz4, and uncompressed chunks") {
    checkRoundTrip(fixture(new Mcap.Writer(chunked = false)))
    checkRoundTrip(fixture(new Mcap.Writer(compression = "lz4")))
    checkRoundTrip(fixture(new Mcap.Writer(compression = "")))
  }

  test("schema/channel in one chunk resolve messages in later chunks") {
    // chunkSize=1 flushes after every record: 8 single-record chunks,
    // so every message lands in a chunk AFTER its channel definition
    checkRoundTrip(fixture(new Mcap.Writer(chunkSize = 1)))
  }

  test("Metadata(0x0C) records round-trip and land in the summary " +
      "index (reference executor writes explain stats this way)") {
    val w = new Mcap.Writer()
    w.writeSchema(Mcap.SchemaRec(1, "package/test", "ros1msg",
      "string data".getBytes))
    w.writeChannel(Mcap.ChannelRec(0, 1, "topic-0", "ros1"))
    w.writeMessage(Mcap.MessageRec(0, 1L, 1L, 1L, "m1".getBytes))
    w.writeMetadata("query",
      Seq("context" -> """{"nodes":[]}""", "other" -> "v"))
    w.writeMetadata("second", Seq("a" -> "b"))
    val bytes = w.finish()
    // messages unaffected by interleaved metadata
    assert(Mcap.read(bytes).toSeq.map(_.topic) == Seq("topic-0"))
    val md = Mcap.readMetadata(bytes)
    assert(md.map(_.name) == Seq("query", "second"))
    assert(md.head.kv == Map(
      "context" -> """{"nodes":[]}""", "other" -> "v"))
    assert(md(1).kv == Map("a" -> "b"))
    // footer points at a summary section holding MetadataIndex(0x0D)
    // records whose offsets locate the 0x0C records exactly
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val footerStart = bytes.length - 8 - 9 - 20 // magic + rec hdr + body
    assert((bytes(footerStart) & 0xff) == 0x02)
    buf.position(footerStart + 9)
    val summaryStart = buf.getLong()
    assert(summaryStart > 0L, "footer must point at the summary section")
    buf.position(summaryStart.toInt)
    val names = Seq("query", "second").map { expect =>
      assert((buf.get() & 0xff) == 0x0D, "MetadataIndex record")
      buf.getLong() // record length
      val off = buf.getLong(); val len = buf.getLong()
      assert((bytes(off.toInt) & 0xff) == 0x0C,
        s"index offset $off must locate a Metadata record")
      assert(len > 0)
      val nameLen = buf.getInt()
      val nb = new Array[Byte](nameLen); buf.get(nb)
      val got = new String(nb, java.nio.charset.StandardCharsets.UTF_8)
      assert(got == expect)
      got
    }
    assert(names == Seq("query", "second"))
  }

  test("metadata round-trips in un-chunked streams too") {
    val w = new Mcap.Writer(chunked = false)
    w.writeSchema(Mcap.SchemaRec(1, "p/t", "ros1msg", Array[Byte]()))
    w.writeChannel(Mcap.ChannelRec(0, 1, "t", "ros1"))
    w.writeMessage(Mcap.MessageRec(0, 1L, 1L, 1L, "x".getBytes))
    w.writeMetadata("m", Seq("k" -> "v"))
    val bytes = w.finish()
    assert(Mcap.readMetadata(bytes) ==
      Seq(Mcap.MetadataRec("m", Map("k" -> "v"))))
    assert(Mcap.read(bytes).size == 1)
  }

  test("reader rejects non-MCAP bytes") {
    assertThrows[IllegalArgumentException](
      Mcap.read("not an mcap".getBytes ++ new Array[Byte](20)).toSeq)
  }

  test("distributed ingest: binaryFile source -> canonical messages") {
    val dir = Files.createTempDirectory("graft-mcap").toString
    Files.write(Paths.get(s"$dir/deviceA.mcap"), fixture())
    Files.write(Paths.get(s"$dir/deviceB.mcap"), fixture())
    val df = Mcap.load(spark, dir)
    assert(df.count() == 12)
    assert(df.select("producer").distinct().collect()
      .map(_.getString(0)).toSet == Set("deviceA", "deviceB"))
    // canonical columns feed the regular ingest path directly
    val deduped = df.select("producer", "topic", "time", "seq")
      .dropDuplicates("producer", "topic", "time", "seq")
    assert(deduped.count() == 12)
    // merges by time like any other catalog-backed stream
    val ordered = df.where(col("producer") === "deviceA")
      .orderBy("time").select("topic").collect().map(_.getString(0))
    assert(ordered.toSeq == Seq("topic-0", "topic-1", "topic-0",
      "topic-1", "topic-0", "topic-1"))
  }

  // --- ros2 / CDR decode e2e --------------------------------------------

  /** Test-side XCDR1 little-endian encoder: tracks position relative to
    * the first byte after the 4-byte encapsulation header, pads each
    * primitive to its own size — the rules rmw_fastrtps writes by. */
  private final class CdrEnc {
    private val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0x00, 0x01, 0x00, 0x00)) // CDR_LE
    private def pos = bos.size() - 4
    private def align(n: Int): Unit =
      while (pos % n != 0) bos.write(0)
    private def le(n: Int)(fill: java.nio.ByteBuffer => Unit): Unit = {
      val b = java.nio.ByteBuffer.allocate(n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fill(b); bos.write(b.array())
    }
    def u8(v: Int): this.type = { bos.write(v & 0xff); this }
    def i32(v: Int): this.type = { align(4); le(4)(_.putInt(v)); this }
    def u32(v: Long): this.type = { align(4); le(4)(_.putInt(v.toInt)); this }
    def f64(v: Double): this.type = { align(8); le(8)(_.putDouble(v)); this }
    def str(s: String): this.type = {
      val b = s.getBytes("UTF-8")
      u32(b.length + 1L); bos.write(b); bos.write(0); this
    }
    def wstr(s: String): this.type = {
      u32(s.length.toLong)
      s.foreach(c => le(2)(_.putShort(c.toShort))); this
    }
    def bytes: Array[Byte] = bos.toByteArray
  }

  private val ros2Def =
    """std_msgs/Header header
      |uint8 mode
      |int32 count
      |float64[3] pose
      |int32[] samples
      |string<=10 tag
      |wstring note
      |================================================================================
      |MSG: std_msgs/Header
      |time stamp
      |string frame_id
      |""".stripMargin

  private def ros2Payload(mode: Int, count: Int): Array[Byte] =
    new CdrEnc()
      .i32(1).u32(500000000L)      // header.stamp: 1.5s -> 1500000000 ns
      .str("base")                 // header.frame_id
      .u8(mode)                    // uint8 (value > 127 tests widening)
      .i32(count)                  // forces 2-byte alignment pad
      .f64(1.5).f64(-2.5).f64(3.0) // pose[3]
      .u32(2L).i32(7).i32(9)       // samples: seq of 2
      .str("hi")                   // bounded string, same wire shape
      .wstr("ok")                  // wstring: u16 code units
      .bytes

  test("ros2msg/CDR e2e: schema + payload through MCAP -> typed columns") {
    val w = new Mcap.Writer
    val schema = Mcap.SchemaRec(1, "sensor_msgs/msg/Scan", "ros2msg",
      ros2Def.getBytes)
    w.writeSchema(schema)
    w.writeChannel(Mcap.ChannelRec(0, 1, "/scan", "cdr"))
    w.writeMessage(Mcap.MessageRec(0, 0, 10L, 10L, ros2Payload(200, -7)))
    w.writeMessage(Mcap.MessageRec(0, 1, 20L, 20L, ros2Payload(3, 42)))
    val dir = Files.createTempDirectory("graft-mcap-ros2").toString
    Files.write(Paths.get(s"$dir/bot.mcap"), w.finish())

    val loaded = Mcap.load(spark, dir)
    val decoded = Mcap.decodeDf(loaded, schema)
    // resolved Spark shape matches Ros2MsgSpec's transform expectations:
    // widened unsigneds, ns-Long time, nested Header struct
    val dt = decoded.schema("decoded").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(dt.fieldNames.toSeq == Seq("header", "mode", "count", "pose",
      "samples", "tag", "note"))
    assert(dt("mode").dataType.typeName == "short")
    assert(dt("header").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType]("stamp")
      .dataType.typeName == "long")

    val rows = decoded.orderBy("time").select(
      col("decoded.header.stamp"), col("decoded.header.frame_id"),
      col("decoded.mode"), col("decoded.count"), col("decoded.pose"),
      col("decoded.samples"), col("decoded.tag"), col("decoded.note"))
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1500000000L)
    assert(rows(0).getString(1) == "base")
    assert(rows(0).getShort(2) == 200 && rows(1).getShort(2) == 3)
    assert(rows(0).getInt(3) == -7 && rows(1).getInt(3) == 42)
    assert(rows(0).getSeq[Double](4) == Seq(1.5, -2.5, 3.0))
    assert(rows(0).getSeq[Int](5) == Seq(7, 9))
    assert(rows(0).getString(6) == "hi")
    assert(rows(0).getString(7) == "ok")

    // flat view: AnalyzeSchema queue discipline — record subfields to
    // the back, fixed-array elements to the front, var/bounded excluded
    val s = graft.ros2.Ros2Msg.parse(ros2Def, "sensor_msgs", "Scan")
    assert(graft.ros2.Ros2Msg.flatFields(s).map(_._1) == Seq(
      "header.stamp", "header.frame_id", "mode", "count",
      "pose[0]", "pose[1]", "pose[2]", "tag", "note"))
    val flat = decoded.orderBy("time")
      .select(graft.ros2.Ros2Msg.flatColumns(s): _*)
    assert(flat.columns.toSeq == Seq("header.stamp", "header.frame_id",
      "mode", "count", "pose[0]", "pose[1]", "pose[2]", "tag", "note"))
    assert(flat.collect()(1).getDouble(5) == -2.5)
  }

  test("ros2 CDR big-endian payload decodes via the header flag") {
    val s = graft.ros2.Ros2Msg.parse("int32 a\nuint16 b\n", "pkg", "M")
    val be = java.nio.ByteBuffer.allocate(4 + 4 + 2)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    be.put(Array[Byte](0x00, 0x00, 0x00, 0x00)) // CDR_BE
    be.putInt(-12345).putShort(0xBEEF.toShort)
    val row = graft.ros2.Ros2Msg.decode(s, be.array())
    assert(row.getInt(0) == -12345)
    assert(row.getInt(1) == 0xBEEF)
  }
}
