package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, TextOps}
import graft.streaming.CorpusDedup

/** Streaming incremental corpus dedup: accept-first-occurrence over a
  * micro-batched document stream, equivalent to batch exact dedup over
  * the concatenated history but never re-scanning corpus text. */
class StreamingCorpusDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dirs(): (String, String, String, String) = {
    val base = Files.createTempDirectory("graft-corpusdedup").toString
    (s"$base/corpus", s"$base/tier", s"$base/fp", s"$base/ckpt")
  }

  test("appendBatch accepts first occurrences only, across batches " +
      "and within a batch") {
    val (corpus, tier, fp, _) = dirs()
    val b1 = Seq((1L, "alpha beta"), (2L, "gamma delta"),
      (7L, "alpha beta")) // in-batch dup of 1 — min id wins
      .toDF("doc_id", "text")
    assert(CorpusDedup.appendBatch(spark, b1, 1L, corpus, tier, fp)
      == 2L)
    val b2 = Seq((10L, "gamma delta"), // cross-batch dup of 2
      (11L, "epsilon zeta"),
      (12L, "epsilon zeta"), // in-batch dup of 11
      (13L, "alpha beta")) // cross-batch dup of 1
      .toDF("doc_id", "text")
    assert(CorpusDedup.appendBatch(spark, b2, 2L, corpus, tier, fp)
      == 1L)
    // `version` is a partition column now — reads back as Integer
    val accepted = spark.read.parquet(corpus)
      .select(col("doc_id"), col("version").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(accepted == Map(1L -> 1L, 2L -> 1L, 11L -> 2L))
    // sidecars carry one fingerprint row per accepted doc and one
    // tier partial per (bucket, version)
    val fps = spark.read.parquet(fp)
    assert(fps.count() == 3 && fps.select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 11L))
    val tierRows = spark.read.parquet(tier)
    assert(tierRows.select(col("version").cast("long")).distinct()
      .as[Long].collect().toSet == Set(1L, 2L))
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("streaming run over MemoryStream equals batch exact dedup of " +
      "the concatenated history") {
    val (corpus, tier, fp, ckpt) = dirs()
    implicit val sqlCtx = spark.sqlContext
    // 60 docs across 3 batches, every 3rd a copy of an earlier text
    def text(i: Int) = s"document number ${i % 40} body"
    val all = (0 until 60).map(i => (i.toLong, text(i)))
    val stream = MemoryStream[(Long, String)]
    all.grouped(20).foreach(stream.addData(_))
    val q = CorpusDedup.start(spark,
      stream.toDF().toDF("doc_id", "text"),
      corpus, tier, fp, ckpt)
    q.awaitTermination()
    val streamed = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().toSet
    // ground truth: batch exact dedup keeps min id per fingerprint
    val truth = Dedup.exact(all.toDF("doc_id", "text"))
      .select("keep_id").as[Long].collect().toSet
    assert(streamed == truth,
      s"streamed=$streamed truth=$truth")
    // the accepted set carries exactly one row per distinct text
    assert(streamed.size == all.map(_._2).distinct.size)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("compactTier folds version partials to one row per bucket " +
      "without changing membership answers") {
    val (corpus, tier, fp, _) = dirs()
    (1L to 4L).foreach { v =>
      val b = (v * 100L until v * 100L + 10L)
        .map(i => (i, s"doc $i body")).toDF("doc_id", "text")
      CorpusDedup.appendBatch(spark, b, v, corpus, tier, fp)
    }
    val before = spark.read.parquet(tier).count()
    CorpusDedup.compactTier(spark, tier)
    val after = spark.read.parquet(tier)
    assert(after.count() < before)
    assert(after.groupBy("bloom_bucket").count()
      .agg(max("count")).head().getLong(0) == 1L,
      "one merged row per bucket")
    // dedup answers are unchanged against the compacted tier: dups of
    // every prior version still drop, a new doc still lands
    val probe = Seq((900L, "doc 101 body"), (901L, "doc 401 body"),
      (902L, "genuinely new body")).toDF("doc_id", "text")
    assert(CorpusDedup.appendBatch(spark, probe, 9L, corpus, tier, fp)
      == 1L)
    assert(spark.read.parquet(corpus).where(col("doc_id") === 902L)
      .count() == 1)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("property: random batch histories accept exactly the " +
      "first-occurrence set") {
    // seeded random histories: ids unique across the history, texts
    // drawn from a small universe so cross-batch and in-batch dups
    // are frequent; the accepted set must always be min-id-per-text
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 5) {
      val (corpus, tier, fp, _) = dirs()
      val nDocs = 20 + rnd.nextInt(40)
      val texts = (0 until 8 + rnd.nextInt(10)).map(i => s"body $i")
      val docs = (0 until nDocs).map(i =>
        (i.toLong, texts(rnd.nextInt(texts.size))))
      // random partition into 1..5 batches, order preserved
      val nBatches = 1 + rnd.nextInt(5)
      val cuts = (Seq(0, docs.size) ++
        Seq.fill(nBatches - 1)(rnd.nextInt(docs.size + 1)))
        .distinct.sorted
      cuts.sliding(2).zipWithIndex.foreach { case (Seq(a, b), v) =>
        val batch = docs.slice(a, b)
        if (batch.nonEmpty)
          CorpusDedup.appendBatch(spark,
            batch.toDF("doc_id", "text"), v + 1L, corpus, tier, fp)
      }
      val accepted = spark.read.parquet(corpus)
        .select("doc_id").as[Long].collect().toSet
      val want = docs.groupBy(_._2).values.map(_.map(_._1).min).toSet
      assert(accepted == want, s"trial $trial: got $accepted want $want")
    }
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("tier partials merge: a batch of pure duplicates accepts " +
      "nothing and appends no tier rows") {
    val (corpus, tier, fp, _) = dirs()
    val b1 = (0L until 30L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    assert(CorpusDedup.appendBatch(spark, b1, 1L, corpus, tier, fp)
      == 30L)
    val dups = (100L until 130L).map(i => (i, s"text ${i - 100}"))
      .toDF("doc_id", "text")
    assert(CorpusDedup.appendBatch(spark, dups, 2L, corpus, tier, fp)
      == 0L)
    assert(spark.read.parquet(corpus).count() == 30)
    assert(spark.read.parquet(tier)
      .select(col("version").cast("long")).distinct()
      .as[Long].collect().toSet == Set(1L))
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("replaying a batch with the same version is idempotent " +
      "(foreachBatch is at-least-once)") {
    val (corpus, tier, fp, _) = dirs()
    val b1 = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    assert(CorpusDedup.appendBatch(spark, b1, 1L, corpus, tier, fp)
      == 2L)
    val b2 = Seq((10L, "gamma"), (11L, "alpha")).toDF("doc_id", "text")
    assert(CorpusDedup.appendBatch(spark, b2, 2L, corpus, tier, fp)
      == 1L)
    def snapshot() = (
      spark.read.parquet(corpus).select("doc_id").as[Long]
        .collect().sorted.toSeq,
      spark.read.parquet(fp).select("doc_id").as[Long]
        .collect().sorted.toSeq,
      spark.read.parquet(tier).count())
    val before = snapshot()
    // crash-replay: same batch, same version, state already committed
    assert(CorpusDedup.appendBatch(spark, b2, 2L, corpus, tier, fp)
      == 1L)
    assert(snapshot() == before,
      "replay must replace its own version partitions, not append")
    assert(before._1 == Seq(1L, 2L, 10L))
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("replay heals a partial crash (corpus written, sidecars not)") {
    val (corpus, tier, fp, _) = dirs()
    val b1 = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    CorpusDedup.appendBatch(spark, b1, 1L, corpus, tier, fp)
    val b2 = Seq((10L, "gamma"), (11L, "alpha")).toDF("doc_id", "text")
    CorpusDedup.appendBatch(spark, b2, 2L, corpus, tier, fp)
    // simulate a crash between the corpus write and the sidecar
    // writes of version 2: sidecars vanish, corpus rows remain
    val conf = spark.sparkContext.hadoopConfiguration
    for (dir <- Seq(fp, tier)) {
      val p = new org.apache.hadoop.fs.Path(s"$dir/version=2")
      assert(p.getFileSystem(conf).delete(p, true))
    }
    assert(CorpusDedup.appendBatch(spark, b2, 2L, corpus, tier, fp)
      == 1L)
    // corpus has no duplicates and all three stores agree again
    val docs = spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq
    assert(docs == Seq(1L, 2L, 10L), s"got $docs")
    assert(spark.read.parquet(fp).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 10L))
    // and the healed sidecars dedup the next batch correctly
    assert(CorpusDedup.appendBatch(spark,
      Seq((20L, "gamma"), (21L, "delta")).toDF("doc_id", "text"),
      3L, corpus, tier, fp) == 1L)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }
}
