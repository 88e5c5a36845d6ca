package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.Ingest
import graft.tools.Inspect

/** Storage inspection — treeinspect/walinspect analogues
  * (reference: cli/cmd/treeinspect.go, walinspect.go). The row-group
  * report must agree exactly with the data it summarizes while reading
  * footers only, and the checkpoint listing must expose the
  * planned-but-uncommitted batch state that drives crash replay.
  */
class InspectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ingested(): (String, String) = {
    val base = Files.createTempDirectory("graft-inspect").toString
    val in = s"$base/in"; val out = s"$base/out"; val cp = s"$base/cp"
    val day = 86400000000000L
    val rows = Seq(
      ("p0", "click", 1L * day + 5L, 1L, 1.0),
      ("p0", "click", 1L * day + 900L, 2L, 2.0),
      ("p1", "click", 2L * day + 7L, 3L, 3.0),
      ("p1", "error", 1L * day + 9L, 4L, 4.0)
    ).toDF("producer", "topic", "time", "seq", "value")
    rows.write.parquet(in)
    val stream = spark.readStream.schema(rows.schema).parquet(in)
    Ingest.startWithStats(spark, stream, out, s"$base/stats", cp,
      controlDir = Some(s"$base/control")).awaitTermination(120000)
    (out, cp)
  }

  test("rowGroups reports the exact rows/time ranges from footers only") {
    val (out, _) = ingested()
    val rg = Inspect.rowGroups(spark, out)
    val data = spark.read.parquet(out)

    // totals agree with the data exactly
    assert(rg.agg(sum("rows")).head.getLong(0) == data.count())
    // per-(topic, day) totals agree too — partition parsing is right
    // the partition column re-reads as Integer; compare in one type
    val perPart = rg.groupBy("topic", "day").agg(sum("rows").as("n"))
      .collect()
      .map(r => (r.getString(0), r.get(1).toString.toLong) ->
        r.getLong(2)).toMap
    val truth = data.groupBy("topic", "day").count().collect()
      .map(r => (r.getString(0), r.get(1).toString.toLong) ->
        r.getLong(2)).toMap
    assert(perPart == truth)
    // footer min/max track the real extremes per partition
    val clickMin = rg.where(col("topic") === "click")
      .agg(min("time_min"), max("time_max")).head
    val clickTruth = data.where(col("topic") === "click")
      .agg(min("time"), max("time")).head
    assert(clickMin.getLong(0) == clickTruth.getLong(0))
    assert(clickMin.getLong(1) == clickTruth.getLong(1))
    // producer + version stats ride along for free
    val r0 = rg.where(col("topic") === "error").head
    assert(r0.getAs[String]("producer_min") == "p1")
    assert(r0.getAs[Long]("version_min") == 1L)
    // byte sizes are real (footer compressed sizes, not zero)
    assert(rg.where(col("bytes") <= 0L).count() == 0)
  }

  test("printTree renders the topic → day → file hierarchy") {
    val (out, _) = ingested()
    val buf = new ByteArrayOutputStream()
    Inspect.printTree(spark, out, new PrintStream(buf, true, "UTF-8"))
    val s = buf.toString("UTF-8")
    assert(s.contains("topic=click") && s.contains("topic=error"))
    assert(s.contains("day=1") && s.contains("day=2"))
    assert("rg0".r.findAllIn(s).nonEmpty && s.contains("rows"))
    // the topic filter narrows the report
    val buf2 = new ByteArrayOutputStream()
    Inspect.printTree(spark, out, new PrintStream(buf2, true, "UTF-8"),
      topicFilter = Some("error"))
    assert(!buf2.toString("UTF-8").contains("topic=click"))
  }

  test("checkpoint lists committed batches and flags pending ones") {
    val (_, cp) = ingested()
    val batches = Inspect.checkpoint(cp)
    assert(batches.nonEmpty && batches.forall(_.committed))
    assert(batches.head.id == 0L)
    // the dedup watermark state surfaces in the batch metadata
    assert(batches.last.watermarkMs.isDefined)

    // fabricate the crash state walinspect exists for: offsets written
    // (batch planned) with no commit — must surface as pending
    val next = batches.map(_.id).max + 1
    Files.copy(Paths.get(s"$cp/offsets/${batches.last.id}"),
      Paths.get(s"$cp/offsets/$next"), StandardCopyOption.REPLACE_EXISTING)
    val after = Inspect.checkpoint(cp)
    assert(after.count(!_.committed) == 1)
    assert(after.find(!_.committed).get.id == next)

    val buf = new ByteArrayOutputStream()
    Inspect.printCheckpoint(cp, new PrintStream(buf, true, "UTF-8"))
    val s = buf.toString("UTF-8")
    assert(s.contains("batch 0: committed") && s.contains("PENDING"))
  }
}
