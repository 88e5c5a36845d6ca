package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Sampling
import graft.util.Maint

/** Incremental training-shard maintenance — the streaming tail of the
  * dataloader chain: as new curated/deduplicated documents arrive
  * (e.g. [[CorpusDedup]] survivors), their id sequences extend the
  * persisted [[graft.export.Export.writeSequenceShards]] layout so a
  * dataloader always reads a complete, current shard set without ever
  * re-packing the whole corpus.
  *
  * Layout under `rootDir`:
  *   - `docs`: (doc_id, <idsCol>, lane, version) — the accepted
  *     per-document id sequences, version-partitioned (the
  *     [[CorpusDedup.appendBatch]] replay discipline: a retried batch
  *     dynamic-overwrites exactly its own partition) and clustered by
  *     `lane` within each version's files so a lane rebuild's pushed
  *     lane-IN predicate prunes row groups.
  *   - `shards`: the writeSequenceShards layout — one
  *     `pack_bucket=<lane>` directory per lane, rows (seq_idx, n_docs,
  *     starts, ids) with every `ids` exactly seqLen long.
  *
  * Incrementality contract: lane membership is the salted hash of the
  * doc id ([[Sampling.laneOf]]) and within-lane order is (hash, id) —
  * a pure function of the ACCEPTED SET, not of arrival order — so the
  * shard store after N batches is BIT-IDENTICAL to batch
  * `packSequences` + `writeSequenceShards` over the concatenated
  * accepted history (spec-pinned over random multi-batch splits).
  * A new document splices into the middle of its lane's stream by
  * hash order, so ITS lane re-derives from the lane's doc history —
  * but only lanes the batch actually touched rewrite: the affected
  * lane set is collected per batch (≤ nBuckets ints) and every other
  * lane's shard directory keeps its exact files. The lane-history
  * read is row-group-pruned by the pushed lane-IN predicate and never
  * touches corpus text (the `docs` sidecar carries encoded ids).
  * Size nBuckets so one lane's history fits a rebuild comfortably —
  * lanes are hash-uniform, and nBuckets scales with the cluster (the
  * [[Sampling.packSequences]] lane discipline).
  *
  * Crash safety: the docs write is a version-partitioned dynamic
  * overwrite (replay replaces, never duplicates); the shard rewrite
  * is derived state — rebuilt lane dirs land under a temp tree and
  * swap in via [[Maint]]'s park protocol (originals under
  * `.swap_old` until the commit delete; [[Maint.healParkedFlat]] at
  * entry restores any original whose live dir vanished mid-swap).
  * Replay ∘ appendBatch = appendBatch: a replayed batch re-derives
  * the same lane set from the same rows and rewrites the same dirs
  * with identical content. Single-writer, like every maintenance
  * face here.
  */
object SequenceShards {

  /** Append one batch of (id, id-sequence) rows and bring every
    * affected lane's shards current. Returns the affected lane ids.
    *
    * `version` must be issued monotonically and reused on retry (the
    * streaming face passes batchId + 1). Documents with empty id
    * sequences are dropped, matching [[Sampling.packSequences]]. */
  def appendBatch(spark: SparkSession, batch: DataFrame, version: Long,
      rootDir: String, seqLen: Int, nBuckets: Int, eosId: Long,
      idCol: String = "doc_id", idsCol: String = "bpe_ids",
      salt: String = "graft"): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val verb = "sequenceShards"
    val root = new Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shardsRoot = new Path(root, "shards")
    val trashRoot = new Path(root, ".swap_old")
    val tmp = new Path(root, ".shards_tmp")
    // the packing contract is STORE STATE, not a per-call argument
    // (the writeBm25Index meta discipline / the frozen-quantizer
    // rule): a drifted nBuckets would route ids to lanes that
    // disagree with the stored `lane` values — the rebuild's filter
    // and packSequences' re-derivation would silently diverge — and a
    // drifted seqLen/eosId/salt would splice incompatible sequences
    // into surviving lanes. First append freezes the contract; later
    // appends fail loudly on any mismatch.
    val meta = new Path(root, "meta")
    if (!fs.exists(meta)) {
      import spark.implicits._
      Seq((seqLen, nBuckets, eosId, salt))
        .toDF("seq_len", "n_buckets", "eos_id", "salt")
        .coalesce(1).write.mode("overwrite").parquet(meta.toString)
    } else {
      val m = spark.read.parquet(meta.toString).head()
      val stored = (m.getInt(0), m.getInt(1), m.getLong(2),
        m.getString(3))
      require(stored == ((seqLen, nBuckets, eosId, salt)),
        s"sequenceShards: packing contract drift — store $rootDir " +
          s"was built with (seqLen, nBuckets, eosId, salt) = $stored, " +
          s"this append passed (${(seqLen, nBuckets, eosId, salt)})")
    }
    // heal a prior crashed swap BEFORE anything reads the shard tree
    Maint.healParkedFlat(fs, shardsRoot, trashRoot, verb)
    fs.delete(tmp, true)
    Maint.step(verb, "cleaned")
    // 1. the batch's rows, laned; empty sequences dropped (nothing to
    //    emit — packSequences drops them too, and a docs row that can
    //    never contribute would still force its lane to rewrite)
    val laned = batch
      .select(col(idCol), col(idsCol))
      .where(size(col(idsCol)) >= 1)
      .withColumn("lane", Sampling.laneOf(col(idCol), nBuckets, salt))
    // 2. version-partitioned dynamic overwrite (the writeVersioned
    //    replay contract), rows clustered by lane for the rebuild's
    //    pushed lane-IN row-group prune
    laned.withColumn("version", lit(version))
      .repartition(col("lane"))
      .sortWithinPartitions(col("lane"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("version")
      .parquet(s"$rootDir/docs")
    Maint.step(verb, "docs-written")
    // 3. affected lanes: ≤ nBuckets ints off the batch
    val lanes = laned.select(col("lane")).distinct()
      .collect().map(_.getLong(0)).sorted
    if (lanes.isEmpty) return Nil
    // 4. rebuild ONLY those lanes from the docs history (all versions
    //    — a replay's own partition was just overwritten, so the read
    //    sees exactly the accepted set). packSequences re-derives the
    //    lane from the id, so filtered input ⇒ exactly those lanes'
    //    rows, equal to the full batch pack's (lanes pack
    //    independently).
    val history = spark.read.parquet(s"$rootDir/docs")
      .where(col("lane").isin(lanes.map(l => l: Any): _*))
      .select(col(idCol), col(idsCol))
    val packed = Sampling.packSequences(history, seqLen, nBuckets,
      eosId, idCol, idsCol, salt)
    graft.export.Export.sequenceShardFrame(packed)
      .write.partitionBy("pack_bucket").parquet(tmp.toString)
    Maint.step(verb, "built")
    // 5. swap the rebuilt lane dirs in under the park protocol
    fs.mkdirs(shardsRoot)
    for (laneDir <- fs.listStatus(tmp) if laneDir.isDirectory) {
      val live = new Path(shardsRoot, laneDir.getPath.getName)
      val keep = new Path(trashRoot, laneDir.getPath.getName)
      Maint.swapPartitionDir(fs, live, laneDir.getPath, keep, verb)
    }
    Maint.step(verb, "lanes-swapped")
    fs.delete(trashRoot, true) // commit: originals now disposable
    fs.delete(tmp, true)
    Maint.step(verb, "committed")
    lanes.toSeq
  }

  /** Start the streaming shard maintenance ([[appendBatch]] per
    * micro-batch; the [[CorpusDedup.start]] checkpoint/replay
    * contract — at-least-once foreachBatch + idempotent appends =
    * effectively-exactly-once shard state). */
  def start(spark: SparkSession, stream: DataFrame, rootDir: String,
      seqLen: Int, nBuckets: Int, eosId: Long, checkpointDir: String,
      idCol: String = "doc_id", idsCol: String = "bpe_ids",
      salt: String = "graft"): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(spark, batch, batchId + 1, rootDir, seqLen,
          nBuckets, eosId, idCol, idsCol, salt)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The current shard store as a frame (the dataloader's read face):
    * identical schema to [[graft.export.Export.writeSequenceShards]]
    * output. */
  def read(spark: SparkSession, rootDir: String): DataFrame =
    spark.read.parquet(s"$rootDir/shards")

  /** One epoch's COMPLETE visit order over the store — the dataloader
    * consumes this directly: every sequence stamped with `lane_ord`
    * (which shard to visit when, [[Sampling.epochLaneOrder]]'s
    * driver-side permutation under the store's frozen nBuckets/salt)
    * and `epoch_pos` (the within-shard order,
    * [[Sampling.epochShuffle]]); iterating by (lane_ord, epoch_pos)
    * reads each training sequence exactly once per epoch in a
    * seed-deterministic pseudo-random order with NO RNG state — any
    * worker re-derives any epoch's slice, and a resumed job re-derives
    * the exact order it crashed in. Row-local + one lane window over
    * the stored shards; the store's packing contract (`meta`)
    * supplies nBuckets and salt so a caller can never shuffle under a
    * drifted lane domain. */
  def readEpoch(spark: SparkSession, rootDir: String, epoch: Long)
      : DataFrame = {
    val m = spark.read.parquet(s"$rootDir/meta").head()
    val nLanes = m.getInt(1)
    val salt = m.getString(3)
    Sampling.epochShuffle(read(spark, rootDir), epoch, "pack_bucket",
        Seq("seq_idx"), salt)
      .withColumn("lane_ord", Sampling.epochLaneOrderCol(
        col("pack_bucket"), nLanes, epoch, salt))
  }
}
