package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.Ingest
import graft.tools.Inspect

/** Incremental compaction (`Ingest.optimize`): only small-file
  * partitions rewrite, data is bit-identical, untouched partitions
  * keep their files, and the rewritten files carry disjoint time
  * ranges (the row-group-pruning contract). The reference's analogue
  * is the WAL manager's per-table incremental merge
  * (server/treemgr/treemgr.go:821-961).
  */
class OptimizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000000000L

  private def files(dir: String): Set[String] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Set.empty
    else d.listFiles().map(_.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_")).toSet
  }

  test("optimize rewrites only small-file partitions, exactly") {
    val out = Files.createTempDirectory("graft-opt").toString
    // hot partition: 6 micro-batch appends of 1 row each, spread over
    // the day so time slicing is observable
    for (i <- 0 until 6)
      Seq(("p0", "click", 1L * day + i * (day / 8) + 1L, i.toLong, i * 1.0))
        .toDF("producer", "topic", "time", "seq", "value")
        .withColumn("day", expr("time div 86400000000000"))
        .write.mode("append").partitionBy("topic", "day").parquet(out)
    // cold partition: one file, must not be touched
    Seq(("p1", "error", 2L * day + 9L, 99L, 9.0))
      .toDF("producer", "topic", "time", "seq", "value")
      .withColumn("day", expr("time div 86400000000000"))
      .write.mode("append").partitionBy("topic", "day").parquet(out)

    val before = spark.read.parquet(out).collect().toSet
    val hotBefore = files(s"$out/topic=click/day=1")
    val coldBefore = files(s"$out/topic=error/day=2")
    assert(hotBefore.size == 6 && coldBefore.size == 1)

    val hotBytes = new java.io.File(s"$out/topic=click/day=1")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.length()).sum
    // target half the partition bytes per file → 2 output slices
    val report = Ingest.optimize(spark, out, maxFilesPerPartition = 4,
      targetBytesPerFile = (hotBytes + 1) / 2)
    assert(report.map(r => (r.topic, r.day, r.filesBefore,
      r.targetFiles)) == Seq(("click", 1L, 6, 2)))

    // data unchanged, cold partition's files untouched, hot shrunk
    assert(spark.read.parquet(out).collect().toSet == before)
    assert(files(s"$out/topic=error/day=2") == coldBefore)
    val hotAfter = files(s"$out/topic=click/day=1")
    assert(hotAfter.size == 2 && hotAfter.intersect(hotBefore).isEmpty)

    // each rewritten file covers a disjoint time slice (footer check)
    val rg = Inspect.rowGroups(spark, out)
      .where(col("topic") === "click").collect()
    val spans = rg.map(r => (r.getAs[Long]("time_min"),
      r.getAs[Long]("time_max"))).sortBy(_._1)
    assert(spans.sliding(2).forall {
      case Array((_, aMax), (bMin, _)) => aMax < bMin
      case _ => true
    })

    // second pass: nothing left to do
    assert(Ingest.optimize(spark, out, maxFilesPerPartition = 4).isEmpty)
  }

  test("optimize swap crash windows heal: a partition parked under " +
      ".swap_old restores at the next pass, the stats ignore hidden " +
      "debris trees, and no data is ever lost") {
    import org.apache.hadoop.fs.Path
    val out = Files.createTempDirectory("graft-optheal").toString
    for (i <- 0 until 6)
      Seq(("p0", "click", 1L * day + i * (day / 8) + 1L, i.toLong, i * 1.0))
        .toDF("producer", "topic", "time", "seq", "value")
        .withColumn("day", expr("time div 86400000000000"))
        .write.mode("append").partitionBy("topic", "day").parquet(out)
    val before = spark.read.parquet(out).collect().toSet
    val fs = new Path(out).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // simulate the mid-swap crash: the live partition was parked
    // (original -> .swap_old) but the optimized copy never renamed in
    // — the old delete-then-rename shape lost this partition outright
    val live = new Path(s"$out/topic=click/day=1")
    val parked = new Path(s"$out/.swap_old/topic=click/day=1")
    fs.mkdirs(parked.getParent)
    assert(fs.rename(live, parked))
    // plus crashed-pass debris the stats must not count
    val debris = new Path(s"$out/.optimize_tmp/topic=click/day=1")
    fs.mkdirs(debris.getParent)
    Seq(("p9", "click", 1L * day + 5L, 7L, 0.0))
      .toDF("producer", "topic", "time", "seq", "value")
      .write.parquet(debris.toString)
    val report = Ingest.optimize(spark, out, maxFilesPerPartition = 4)
    // healed first, then optimized the restored 6-file partition;
    // the debris rows never entered the stats or the store
    assert(report.map(r => (r.topic, r.day, r.filesBefore))
      == Seq(("click", 1L, 6)))
    assert(spark.read.parquet(out).collect().toSet == before)
    assert(!fs.exists(new Path(s"$out/.swap_old")))
  }

  test("property: random append histories optimize to the same data, " +
      "idempotently, cold partitions untouched") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 3) {
      val out = Files.createTempDirectory(s"graft-optp$trial").toString
      val topics = Seq("click", "error", "view")
      // random micro-batch history: 1-row appends scattered over
      // partitions, with some repeated identity keys
      val appended = (0 until 12 + rnd.nextInt(10)).map { i =>
        val t = topics(rnd.nextInt(topics.length))
        val d = 1L + rnd.nextInt(3)
        val time = d * day + rnd.nextInt(86400) * 1000000000L
        val seq = rnd.nextInt(8).toLong // collisions are duplicates
        ("p" + rnd.nextInt(3), t, time, seq, i * 1.0)
      }
      appended.grouped(3).foreach { batch =>
        batch.toDF("producer", "topic", "time", "seq", "value")
          .withColumn("day", expr("time div 86400000000000"))
          .write.mode("append").partitionBy("topic", "day").parquet(out)
      }
      val threshold = 1 + rnd.nextInt(4)
      val before = spark.read.parquet(out)
        .dropDuplicates("producer", "topic", "time", "seq")
        .collect().map(_.toString).sorted.toSeq
      val coldDirs = new java.io.File(out).listFiles()
        .filter(_.isDirectory).flatMap(_.listFiles())
        .filter(_.isDirectory)
        .map(d => d.getPath -> files(d.getPath))
        .filter(_._2.size <= threshold).toMap
      val report = Ingest.optimize(spark, out,
        maxFilesPerPartition = threshold)
      // rewritten set = exactly the partitions over the threshold
      report.foreach(r => assert(r.filesBefore > threshold))
      // hot partitions post-state: dedup'd data identical
      val after = spark.read.parquet(out)
        .collect().map(_.toString).sorted.toSeq
      assert(after == before, s"trial $trial data drift")
      // cold partitions keep their exact files
      coldDirs.foreach { case (p, fs) => assert(files(p) == fs) }
      // a second pass finds nothing (thresholds unchanged)
      assert(Ingest.optimize(spark, out,
        maxFilesPerPartition = threshold).isEmpty)
    }
  }

  test("optimize dedups on the identity key like the reference's merge") {
    val out = Files.createTempDirectory("graft-opt2").toString
    val row = ("p0", "click", 1L * day + 5L, 1L, 1.0)
    for (_ <- 0 until 5) // the same row appended by 5 "batches"
      Seq(row).toDF("producer", "topic", "time", "seq", "value")
        .withColumn("day", expr("time div 86400000000000"))
        .write.mode("append").partitionBy("topic", "day").parquet(out)
    Ingest.optimize(spark, out, maxFilesPerPartition = 2)
    assert(spark.read.parquet(out).count() == 1)
  }
}
