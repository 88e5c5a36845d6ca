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
}
