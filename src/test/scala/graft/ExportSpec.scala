package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.api.Dp3Service
import graft.export.Export
import graft.mcap.Mcap
import graft.model.EventsCatalog

/** MCAP export sink — the reference's primary query output
  * (multiplexed stream, schema/channel dedup + id remap:
  * server/mcap/merge_coordinator.go:17-99, server/routes/export.go).
  */
class ExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val cat = new EventsCatalog(dir)
  private lazy val svc = new Dp3Service(cat, s => cat.messages(s))

  test("mcap query output round-trips and matches the ndjson rows") {
    val ql = "from p3 click limit 5;"
    val cols = Seq("value", "k")
    val decoded = Mcap.read(svc.queryMcap(spark, ql, cols)).toSeq
    val nd = svc.queryNdjson(spark, ql, cols).collect()
    assert(decoded.length == 5 && nd.length == 5)
    decoded.zip(nd).foreach { case (d, j) =>
      assert(d.topic == "click")
      assert(j.contains(s""""sequence":${d.sequence}"""))
      // decimal-seconds wire format (mcap_to_json.go formatDecimalTime)
      val lt = d.logTime
      assert(j.contains(
        f""""log_time":${lt / 1000000000L}%d.${lt % 1000000000L}%09d"""))
      // the MCAP payload IS the ndjson "data" object, byte for byte
      assert(j.endsWith(s""""data":${new String(d.data, UTF_8)}}"""))
    }
  }

  test("ndjson clamps corrupt times (null / pre-epoch) to 0 and " +
      "stays valid JSON") {
    import spark.implicits._
    val df = Seq(
      ("t", 1L, Some(-1L), "a"),     // pre-epoch: %d.%09d would
      ("t", 2L, None: Option[Long],  // render `0.-00000001`
        "b"),
      ("t", 3L, Some(1500000000L), "c"))
      .toDF("topic", "seq", "time", "v")
    val lines = Export.ndjson(df, Seq("v")).collect()
    assert(lines.length == 3)
    lines.foreach { l =>
      // every line must parse as a JSON object with numeric times
      assert(l.startsWith("{") && l.endsWith("}"))
      assert(!l.contains(".-"), s"negative nano field leaked: $l")
    }
    assert(lines(0).contains(""""log_time":0.000000000"""))
    assert(lines(1).contains(""""log_time":0.000000000"""))
    assert(lines(2).contains(""""log_time":1.500000000"""))
  }

  test("explain query MCAP carries the NodeStats metadata record " +
      "from the same run that produced the stream") {
    val bytes = svc.queryMcap(spark, "from p3 click limit 5;",
      Seq("value", "k"), explain = true)
    // the data stream itself is unchanged
    assert(Mcap.read(bytes).size == 5)
    val md = Mcap.readMetadata(bytes)
    assert(md.map(_.name) == Seq("query"),
      "one in-band metadata record named 'query' (executor.go:87-94)")
    val ctx = md.head.kv("context")
    assert(ctx.startsWith("""{"nodes":["""), ctx)
    // stats come from the executed run: some node counted real rows
    assert("\"rows\":(\\d+)".r.findAllMatchIn(ctx)
      .exists(_.group(1).toLong >= 5L),
      s"expected an instrumented node with >=5 output rows in: $ctx")
    // non-explain output carries no metadata record
    assert(Mcap.readMetadata(svc.queryMcap(spark,
      "from p3 click limit 5;", Seq("value", "k"))).isEmpty)
  }

  test("multiplexed export remaps channels and keeps time order") {
    val bytes = svc.exportMcap(spark, Seq("click", "error"),
      Seq("value"))
    val msgs = Mcap.read(bytes).toSeq
    assert(msgs.map(_.topic).distinct.toSet == Set("click", "error"))
    val times = msgs.map(_.logTime)
    assert(times == times.sorted)
    // schema/channel records written once per distinct content
    val schemas = Mcap.readSchemaRecs(bytes)
    assert(schemas.map(_.name).toSet == Set("click", "error"))
    assert(schemas.map(_.id).distinct.length == schemas.length)
  }

  test("schema dedup: identical schemas share one record") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10L, 1.5), ("b", 2L, 20L, 2.5))
      .toDF("topic", "seq", "time", "value")
    val bytes = Export.mcap(df.withColumn("topic", lit("same")),
      Seq("value"))
    assert(Mcap.readSchemaRecs(bytes).length == 1)
  }

  test("distributed part files cover the full set and stay ordered") {
    val q = svc.query(spark, "from p3 click;")
    val out = java.nio.file.Files
      .createTempDirectory("graft-mcap-parts").toString
    val parts = Export.writeMcapParts(q, Seq("value"), out, 3)
    assert(parts.nonEmpty)
    val all = parts.flatMap { p =>
      val local = if (p.startsWith("file:")) p.stripPrefix("file:") else p
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(local))
      val msgs = Mcap.read(bytes).toSeq
      // each part is a valid, internally time-ordered MCAP
      assert(msgs.map(_.logTime) == msgs.map(_.logTime).sorted)
      msgs
    }
    assert(all.length == q.count())
    // parts are range-partitioned by time: concatenation stays sorted
    assert(all.map(_.logTime) == all.map(_.logTime).sorted)
  }

  test("schema registry serves /schemas/{hash} lookups") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-schemas").toString
    val w = new Mcap.Writer()
    w.writeSchema(Mcap.SchemaRec(1, "pkg/Msg", "ros1msg",
      "float64 x\n".getBytes(UTF_8)))
    w.writeChannel(Mcap.ChannelRec(0, 1, "/t", "ros1"))
    w.writeMessage(Mcap.MessageRec(0, 1L, 5L, 5L, Array[Byte](1)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(tmp, "prod.mcap"), w.finish())

    val reg = (s: org.apache.spark.sql.SparkSession) =>
      Mcap.loadSchemas(s, tmp)
    val hash = reg(spark).select("schema_hash").head().getString(0)
    val withReg = new Dp3Service(cat, s => cat.messages(s),
      schemaRegistry = Some(reg))
    val row = withReg.schemaFor(spark, hash)
    assert(row.getAs[String]("schema_name") == "pkg/Msg")
    assert(new String(row.getAs[Array[Byte]]("schema_data"), UTF_8)
      == "float64 x\n")
    assertThrows[NoSuchElementException](
      withReg.schemaFor(spark, "nope"))
  }

  test("sequence shards: csv faces round-trip through the int arrays, " +
      "one file per lane, deterministic rebuild, no exchange beyond " +
      "packSequences' one") {
    import spark.implicits._
    import graft.pipeline.Sampling
    val docs = (0L until 200L).map(i =>
      (i, Array.tabulate((i % 7).toInt + 1)(j => (i * 10 + j).toInt)))
      .toDF("doc_id", "bpe_ids")
    val seqLen = 16
    val packed = Sampling.packSequences(docs, seqLen = seqLen,
      nBuckets = 4, eosId = 0L)
    // plan gate on the WRITER frame: packSequences' single
    // hashpartitioning exchange is the only one — the shard layout
    // rides it (executedPlan pre-run prints the single initial tree)
    val frame = Export.sequenceShardFrame(packed)
    val plan = frame.queryExecution.executedPlan.toString
    assert(plan.linesIterator
      .count(_.contains("Exchange hashpartitioning")) == 1, plan)
    val base = java.nio.file.Files
      .createTempDirectory("graft-shards").toString
    Export.writeSequenceShards(packed, s"$base/a")
    // one parquet file per lane directory: lanes are task-atomic
    // under the single hash exchange, so partitionBy can never split
    // or merge one
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val laneDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/a"))
      .filter(_.getPath.getName.startsWith("pack_bucket="))
    assert(laneDirs.nonEmpty)
    laneDirs.foreach { d =>
      val files = fs.listStatus(d.getPath)
        .filter(_.getPath.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getPath}: ${files.length} files")
    }
    // round-trip: decoded arrays ≡ the csv oracle faces, every
    // sequence exactly seqLen ids, starts parallel to n_docs
    val back = spark.read.parquet(s"$base/a")
      .select(col("pack_bucket").cast("int"), col("seq_idx"),
        col("n_docs"),
        array_join(transform(col("starts"),
          x => x.cast("string")), ",").as("starts_csv"),
        array_join(transform(col("ids"),
          x => x.cast("string")), ",").as("ids_csv"),
        size(col("ids")).as("len"), size(col("starts")).as("nstarts"))
    assert(back.where(col("len") =!= seqLen).count() == 0)
    assert(back.where(col("nstarts") =!= col("n_docs")).count() == 0)
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("pack_bucket").cast("long"), col("seq_idx"),
        col("n_docs"), col("starts_csv"), col("ids_csv"))
      .collect().map(_.toString).sorted.toSeq
    assert(snap(back) == snap(packed
      .select(col("pack_bucket"), col("seq_idx"), col("n_docs"),
        col("starts_csv"), col("ids_csv"))))
    // deterministic rebuild: a second write produces identical shard
    // contents lane for lane
    Export.writeSequenceShards(Sampling.packSequences(docs,
      seqLen = seqLen, nBuckets = 4, eosId = 0L), s"$base/b")
    val again = spark.read.parquet(s"$base/b")
      .select(col("pack_bucket").cast("long"), col("seq_idx"),
        col("n_docs"),
        array_join(transform(col("starts"),
          x => x.cast("string")), ",").as("starts_csv"),
        array_join(transform(col("ids"),
          x => x.cast("string")), ",").as("ids_csv"))
    assert(snap(again) == snap(back))
  }
}
