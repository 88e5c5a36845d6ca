package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.{Bloom, TextOps}

/** Streaming incremental corpus dedup — the production face of the
  * batch cross-corpus operators: a document stream is deduplicated
  * against everything already ACCEPTED into the corpus, and survivors
  * append along with two mergeable sidecars so the next batch never
  * re-reads corpus text:
  *
  *   - `tierDir`: per-version bloom-word partials keyed by bucket
  *     (nBuckets × nWords longs per version — kilobytes; bit_or-merged
  *     at read, the stat-tier discipline). The prefilter that answers
  *     "definitely new" from a broadcastable table.
  *   - `fpDir`: (doc_id, _fp, version) — the exact-confirm side. Only
  *     bloom HITS (true dups + the false-positive fraction) probe this
  *     table, and the join reads fingerprints, never text.
  *
  * Result contract: a document is accepted iff its content fingerprint
  * was not accepted before — within the batch, the smallest id wins
  * (deterministic canonical copy). Equivalent to running
  * [[graft.pipeline.Dedup.exact]] over the concatenated history, but
  * each batch costs |batch| work + a hit-fraction fingerprint join —
  * never a corpus scan.
  *
  * 100 TB shape: the tier grows one kilobyte-scale partial per batch
  * (compact by rewriting the bit_or-merged row set when versions pile
  * up — same recipe as `Ingest.compact`); the fingerprint table is the
  * only corpus-sized sidecar and is touched only on the hit fraction,
  * shuffled by `_fp`. Batch work never depends on corpus size.
  *
  * Reference note: dp3's ingest dedups on the message identity key at
  * write time (wal/walmgr.go batch merge); this extends the same
  * write-time discipline to CONTENT identity for document corpora.
  */
object CorpusDedup {

  /** Start the streaming dedup: each micro-batch is deduped in-batch
    * (min id per fingerprint), then against the accepted corpus via
    * the tier + fingerprint sidecars; survivors append to `corpusDir`
    * stamped with the batch's version. AvailableNow + checkpoint make
    * restarts exactly-once, like `Ingest.startWithStats`. */
  def start(spark: SparkSession, stream: DataFrame, corpusDir: String,
      tierDir: String, fpDir: String, checkpointDir: String,
      nBuckets: Int = 1024, nWords: Int = 4, kHashes: Int = 4,
      idCol: String = "doc_id", textCol: String = "text")
      : StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(spark, batch, batchId + 1, corpusDir, tierDir,
          fpDir, nBuckets, nWords, kHashes, idCol, textCol)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** One micro-batch (also the batch-import face): in-batch canonical
    * copy, corpus-membership filter, then the three appends. Returns
    * the number of accepted documents. */
  def appendBatch(spark: SparkSession, batch0: DataFrame, version: Long,
      corpusDir: String, tierDir: String, fpDir: String,
      nBuckets: Int = 1024, nWords: Int = 4, kHashes: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): Long = {
    // in-batch exact dedup: deterministic canonical copy (min id per
    // fingerprint) — the same discipline as Curate.curate's dedup step
    val w = Window.partitionBy(col("_fp")).orderBy(col(idCol).asc)
    val batch = batch0
      .withColumn("_fp", TextOps.fingerprint(col(textCol)))
      .withColumn("_rk", row_number().over(w))
      .where(col("_rk") === 1).drop("_rk")
    val (survivors, tierPin) =
      if (exists(spark, tierDir)) {
        val tier = spark.read.parquet(tierDir)
          .select(col("bloom_bucket") +:
            (0 until nWords).map(n => col(s"bloom_w$n")): _*)
        val fps = spark.read.parquet(fpDir).select(col("_fp"))
        val (s, p) = Bloom.dedupAgainstTierOwned(batch.drop("_fp"),
          tier, fps, nBuckets, nWords, kHashes, textCol)
        (s, Some(p))
      } else (batch.drop("_fp"), None)
    // one computation of the accepted set feeds all three appends
    val (pinned, pin) = graft.pipeline.Dedup.pinNow(
      Bloom.withBloomWords(survivors, nBuckets, nWords, kHashes,
        textCol))
    tierPin.foreach(_.release()) // accepted set is materialized now
    try {
      val n = pinned.count()
      if (n > 0) {
        pinned.select(batch0.columns.map(col): _*)
          .withColumn("version", lit(version))
          .write.mode("append").parquet(corpusDir)
        pinned.select(col(idCol), col("_fp"))
          .withColumn("version", lit(version))
          .write.mode("append").parquet(fpDir)
        pinned.groupBy(col("bloom_bucket"))
          .agg(expr("bit_or(bloom_w0)").as("bloom_w0"),
            (1 until nWords).map(x =>
              expr(s"bit_or(bloom_w$x)").as(s"bloom_w$x")): _*)
          .withColumn("version", lit(version))
          .write.mode("append").parquet(tierDir)
      }
      n
    } finally pin.release()
  }

  /** Compact the tier sidecar: after many batches the tier holds one
    * partial row-set per version; fold them to ONE bit_or-merged row
    * per bucket (≤ nBuckets rows total, version = the max folded).
    * Membership answers are unchanged — bit_or is associative — and
    * the next batch's prefilter reads one row per bucket instead of
    * one per (bucket, version). Write-new-then-flip via fs.rename
    * (Spark refuses to overwrite a path it is reading from). */
  def compactTier(spark: SparkSession, tierDir: String,
      nWords: Int = 4): Unit = {
    if (!exists(spark, tierDir)) return
    val merged = spark.read.parquet(tierDir)
      .groupBy(col("bloom_bucket"))
      .agg(expr("bit_or(bloom_w0)").as("bloom_w0"),
        ((1 until nWords).map(x =>
          expr(s"bit_or(bloom_w$x)").as(s"bloom_w$x"))
          :+ max(col("version")).as("version")): _*)
    val p = new org.apache.hadoop.fs.Path(tierDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(tierDir + ".compact-tmp")
    val old = new org.apache.hadoop.fs.Path(tierDir + ".compact-old")
    merged.repartition(1).write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(p, old), s"cannot stage $tierDir aside")
    require(fs.rename(tmp, p), s"cannot flip compacted tier into place")
    fs.delete(old, true)
    ()
  }

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(
      _.getPath.getName.endsWith(".parquet"))
  }
}
