package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * the tier + fingerprint sidecars; survivors land in `corpusDir`
    * under the batch's version partition.
    *
    * Restart semantics: foreachBatch is at-least-once, so a crashed
    * batch replays with the SAME batchId. [[appendBatch]] is
    * idempotent per version — the accepted set is computed against
    * strictly OLDER versions only (a replay never sees its own partial
    * writes, so it re-derives the identical survivor set), and all
    * three outputs are version-partitioned dynamic overwrites (a
    * replay replaces its own partitions with identical content rather
    * than appending duplicates). Replay ∘ appendBatch = appendBatch,
    * which together with the checkpointed offsets gives effectively-
    * exactly-once corpus contents. */
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

  /** THE versioned sidecar write, shared by [[appendBatch]] and
    * [[appendBatchNearDup]] so the replay contract (dynamic partition
    * overwrite of exactly `version=N`) cannot drift between the exact
    * and near-dup paths: a retried batch replaces its own partition
    * and only its own partition. */
  private def writeVersioned(version: Long)(
      df: DataFrame, dir: String): Unit =
    df.withColumn("version", lit(version))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("version")
      .parquet(dir)

  /** One micro-batch (also the batch-import face): in-batch canonical
    * copy, corpus-membership filter, then three version-partitioned
    * writes. Returns the number of accepted documents.
    *
    * Idempotent per `version`: the membership state is read with
    * `version < N` (partition-pruned, so a crashed attempt's own
    * partial writes are invisible to its replay — without this a
    * bloom false positive could find its OWN fingerprint from the
    * failed attempt and silently drop the document), and each output
    * is a dynamic partition overwrite of `version=N` only, so a
    * replay replaces rather than duplicates. Callers outside the
    * streaming path must issue versions monotonically and reuse the
    * same version when retrying a failed append. */
  def appendBatch(spark: SparkSession, batch0: DataFrame, version: Long,
      corpusDir: String, tierDir: String, fpDir: String,
      nBuckets: Int = 1024, nWords: Int = 4, kHashes: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): Long = {
    // in-batch exact dedup: deterministic canonical copy (min id per
    // fingerprint) — Dedup.canonicalPerFingerprint, the ONE copy of
    // the contract this and Curate.curate share (skew-safe grouped
    // argmin, never a window over the content key, never a semi-join
    // back; see the helper's doc)
    val batch = graft.pipeline.Dedup.canonicalPerFingerprint(batch0,
      TextOps.fingerprint(col(textCol)), idCol)
    val (survivors, tierPin) =
      if (exists(spark, tierDir)) {
        val tier = spark.read.parquet(tierDir)
          .where(col("version") < version)
          .select(col("bloom_bucket") +:
            (0 until nWords).map(n => col(s"bloom_w$n")): _*)
        val fps = spark.read.parquet(fpDir)
          .where(col("version") < version).select(col("_fp"))
        val (s, p) = Bloom.dedupAgainstTierOwned(batch,
          tier, fps, nBuckets, nWords, kHashes, textCol)
        (s, Some(p))
      } else (batch, None)
    // one computation of the accepted set feeds all three writes; the
    // pin severs lineage to the sidecar reads, so the overwrites
    // below never write a path their own plan is reading. Lazy pin:
    // the count below is the single next consumer and materializes
    // the cache in its own job (the pinLazy discipline) — the tier
    // pin is released only AFTER that, or the count would recompute
    // through the released prefilter
    val (pinned, pin) = graft.pipeline.Dedup.pinLazy(
      Bloom.withBloomWords(survivors, nBuckets, nWords, kHashes,
        textCol))
    try {
      // release the prefilter the moment the accepted set is
      // materialized (finally: also on failure)
      val n =
        try pinned.count() finally tierPin.foreach(_.release())
      if (n > 0) {
        writeVersioned(version)(
          pinned.select(batch0.columns.map(col): _*), corpusDir)
        writeVersioned(version)(
          pinned.select(col(idCol), col("_fp")), fpDir)
        writeVersioned(version)(pinned.groupBy(col("bloom_bucket"))
          .agg(expr("bit_or(bloom_w0)").as("bloom_w0"),
            (1 until nWords).map(x =>
              expr(s"bit_or(bloom_w$x)").as(s"bloom_w$x")): _*),
          tierDir)
      }
      n
    } finally pin.release()
  }

  /** Streaming NEAR-duplicate corpus dedup — the shingle-Jaccard face
    * of [[appendBatch]]: drop every batch document within Jaccard
    * `threshold` of anything already ACCEPTED, using a persisted
    * shingle inverted index instead of re-shingling corpus text
    * ([[graft.pipeline.Dedup.crossCorpusPairs]] notes the ref side's
    * exploded index is "the thing to persist between batches" in
    * production — this is that sidecar).
    *
    * `postingsDir` layout: (bucket, sh, ref_id, nb, version) — one row
    * per accepted document per distinct k-shingle, `nb` the document's
    * shingle-set size frozen at accept time, partitioned by `version`
    * (idempotent replay, same discipline as [[appendBatch]]). Rows are
    * clustered by (`bucket` = hash(sh) mod nBuckets, `sh`) within each
    * version's files, and the read path pushes
    * `bucket IN (batch's buckets)` so parquet row-group min/max stats
    * prune postings the batch cannot touch.
    *
    * 100 TB shape (the round-11 review found the old plan shuffled the
    * corpus-sized postings table every batch): the batch side of the
    * candidate join is BROADCAST — a micro-batch's exploded shingles
    * are small by definition (size micro-batches accordingly; the
    * broadcast is the contract) — so postings stream map-side through
    * a BroadcastHashJoin with NO exchange on the corpus-sized side,
    * and only true candidate pairs enter the downstream aggregate.
    * [[NearDupPlan]] is the spec-gated plan builder.
    *
    * Semantics: EXACT `crossCorpusPairs(batch, accepted)` at
    * `maxDf = MaxValue` — each batch's survivors are what the batch
    * operator would keep against the accepted-so-far corpus (the spec
    * pins this equivalence over random multi-batch histories).
    * In-batch near-dups are deliberately NOT collapsed (the corpus
    * boundary is this verb's job, [[graft.pipeline.Curate
    * .dedupAgainstCorpus]]'s contract); run the batch through
    * [[graft.pipeline.Curate.dedupNearDup]] first if needed.
    *
    * `maxDf` is the hot-shingle guard, applied to the CURRENT
    * postings df (corpus side): shingles indexed by more than `maxDf`
    * accepted documents are dropped from candidate generation and
    * intersection counting, while `na`/`nb` stay the frozen set
    * sizes. This deliberately DIVERGES from the batch operator's
    * post-cap sizes — an incremental index cannot retroactively
    * re-size accepted documents as shingles become hot — and is the
    * standard recall-preserving approximation (a shingle shared by
    * hundreds of documents carries no dedup signal; dropping it can
    * only lower measured Jaccard, so `threshold` remains a lower
    * bound on true similarity of dropped docs).
    *
    * Hotness needs no sidecar and no full-index aggregate: a batch
    * shingle's df IS its postings row count, and only BATCH shingles
    * can generate candidates — so df is computed from the map-side
    * postings stream matched against the batch's distinct shingles
    * (one broadcast row per shingle, partial-aggregated before the
    * kilobyte-scale exchange), never via `postings.groupBy(sh)` over
    * the whole corpus-sized index. */
  def appendBatchNearDup(spark: SparkSession, batch0: DataFrame,
      version: Long, corpusDir: String, postingsDir: String,
      k: Int = 3, threshold: Double = 0.5,
      maxDf: Int = Int.MaxValue, nBuckets: Int = 256,
      idCol: String = "doc_id", textCol: String = "text"): Long = {
    import graft.pipeline.{Dedup, TextOps}
    if (maxDf != Int.MaxValue)
      require(maxDf >= 1, s"maxDf must be >= 1 (got $maxDf)")
    // one pinned frame of (id, distinct-shingle array, size): feeds
    // the candidate join's batch side, the survivor filter, and the
    // postings append — the jaccardPairs pin discipline
    // lazy pin: the first consumer is single either way (the bucket-set
    // collect when a corpus exists, else the survivor count) and
    // materializes the cache in its own job
    val (arr, pin) = Dedup.pinLazy(
      graft.util.Spread.ensure(
        batch0.select(col(idCol).as("_id"), col(textCol)), Seq(col("_id")))
        .select(col("_id"),
          TextOps.tokens(lower(col(textCol))).as("_toks"))
        .select(col("_id"),
          Dedup.shinglesOfTokens(col("_toks"), k).as("_arr"))
        .withColumn("_na", size(col("_arr"))))
    try {
      val flagged: DataFrame =
        if (!exists(spark, postingsDir)) {
          // an absent index with a surviving maintenance sibling is a
          // crashed compaction's mid-swap state, NOT an empty corpus —
          // treating it as empty would accept every duplicate in the
          // batch; heal via compactPostings first
          requireNoMidSwap(spark, postingsDir,
            Seq(".compact-trash", ".compact"), "compactPostings")
          arr.select(col("_id")).limit(0) // typed-empty: no corpus yet
        } else {
          // the batch's bucket set, collected driver-side (≤ nBuckets
          // ints off the pinned frame): pushed as a row predicate so
          // the (bucket, sh)-clustered postings files prune row
          // groups the batch cannot match
          val batchBuckets = arr
            .select(explode(col("_arr")).as("sh"))
            .select(pmod(xxhash64(col("sh")), lit(nBuckets.toLong))
              .as("bucket"))
            .distinct().collect().map(_.getLong(0))
          val postings = spark.read.parquet(postingsDir)
            .where(col("version") < version)
            .where(col("bucket").isin(batchBuckets: _*))
            .select(col("sh"), col("ref_id"), col("nb"))
          NearDupPlan.flagged(arr, postings, maxDf, threshold)
        }
      val survivors = arr.join(broadcast(flagged), Seq("_id"), "left_anti")
      // lazy: the count is the single next consumer (pinLazy rule)
      val (pinnedSurv, survPin) = Dedup.pinLazy(survivors)
      try {
        val n = pinnedSurv.count()
        if (n > 0) {
          writeVersioned(version)(
            batch0.join(broadcast(pinnedSurv.select(
              col("_id").as(idCol))), Seq(idCol), "left_semi"),
            corpusDir)
          writeVersioned(version)(
            pinnedSurv.select(col("_id").as("ref_id"),
                col("_na").as("nb"), explode(col("_arr")).as("sh"))
              .withColumn("bucket",
                pmod(xxhash64(col("sh")), lit(nBuckets.toLong)))
              // cluster by (bucket, sh) so the next batch's pushed
              // bucket-IN predicate skips row groups on min/max stats
              .repartition(col("bucket"))
              .sortWithinPartitions(col("bucket"), col("sh")),
            postingsDir)
        }
        n
      } finally survPin.release()
    } finally pin.release()
  }

  /** The near-dup candidate plan, factored out so its physical shape
    * is spec-gateable (StreamingCorpusDedupSpec asserts the
    * corpus-sized `postings` side is NEVER shuffled: every join is a
    * BroadcastHashJoin with postings streaming, and the only
    * exchanges carry matched/aggregated rows).
    *
    * `arr` is the pinned batch frame (_id, _arr, _na); `postings` the
    * (sh, ref_id, nb) index rows. Returns the distinct `_id`s within
    * `threshold` Jaccard of an accepted document. */
  private[graft] object NearDupPlan {
    def flagged(arr: DataFrame, postings: DataFrame, maxDf: Int,
        threshold: Double): DataFrame = {
      val newSide0 = arr.select(col("_id"), col("_na"),
        explode(col("_arr")).as("sh"))
      val newSide =
        if (maxDf == Int.MaxValue) newSide0
        else {
          // df of a batch shingle == its postings row count; one
          // broadcast row per distinct batch shingle keeps the match
          // map-side and 1:1, and the partial aggregate shrinks the
          // exchange to ≤ |batch shingles| rows
          val batchSh = arr.select(explode(col("_arr")).as("sh"))
            .distinct()
          val hot = postings.join(broadcast(batchSh), Seq("sh"))
            .groupBy(col("sh")).agg(count(lit(1)).as("_df"))
            .where(col("_df") > maxDf).select("sh")
          // dropping hot shingles from the BATCH side is equivalent
          // to the old postings-side cap: a pair's intersection rows
          // exist only where both sides hold the shingle
          newSide0.join(broadcast(hot), Seq("sh"), "left_anti")
        }
      // the jaccardPairs length-filter bound, applied at the join:
      // J >= t forces min/max set-size ratio >= t (t - 1e-6 slack
      // keeps the round-to-6 threshold boundary exact), so
      // size-mismatched candidates never cost aggregate rows
      val tSlack = threshold - 1e-6
      val sizeOk =
        if (tSlack <= 0) lit(true)
        else col("p.nb").cast("double") >= lit(tSlack) * col("n._na") &&
          col("n._na").cast("double") >= lit(tSlack) * col("p.nb")
      postings.as("p")
        .join(broadcast(newSide.as("n")),
          col("p.sh") === col("n.sh") && sizeOk)
        .groupBy(col("n._id").as("_id"), col("p.ref_id").as("ref_id"))
        .agg(count(lit(1)).as("_c"), min(col("n._na")).as("na"),
          min(col("p.nb")).as("nb"))
        .where(round(col("_c").cast("double")
          / (col("na") + col("nb") - col("_c")), 6) >= threshold)
        .select(col("_id")).distinct()
    }
  }

  /** Streaming SEMANTIC corpus dedup — the embedding face of
    * [[appendBatchNearDup]]: drop every batch vector within cosine
    * `threshold` of anything already ACCEPTED, using a persisted
    * accepted-vector sidecar instead of re-reading corpus embeddings.
    *
    * `vecDir` layout: (vec_id, embedding, _nrm, cell, version) — one
    * row per accepted vector with its norm frozen at accept time,
    * partitioned by `version` (idempotent replay, the sidecar
    * discipline shared with [[appendBatch]]), rows clustered by
    * `cell` within each version's files so the read path's pushed
    * `cell IN (batch cells)` predicate prunes row groups the batch
    * cannot touch (the coarse-quantizer analogue of the postings
    * bucket prune).
    *
    * `cents` is the FROZEN coarse quantizer
    * ([[graft.pipeline.Similarity.trainIvfCentroids]] on a sample,
    * persisted once): cell assignment must agree across every batch
    * or the cell-equi candidate join loses pairs, so the quantizer is
    * an input, never retrained per batch.
    *
    * Semantics: EXACT [[graft.pipeline.Curate
    * .dedupSemanticAgainstCorpus]] against the accepted-so-far corpus
    * with the same cell pruning (the spec pins this equivalence over
    * random multi-batch histories). In-batch paraphrases are
    * deliberately NOT collapsed — run the batch through
    * [[graft.pipeline.Curate.dedupSemantic]] first if needed, the
    * same contract as the lexical face.
    *
    * 100 TB shape: the batch side of the candidate join is BROADCAST
    * (micro-batches are small by definition — the broadcast is the
    * contract), so the corpus-sized sidecar STREAMS map-side through
    * one BroadcastHashJoin with ZERO exchange on the corpus side
    * ([[SemanticPlan]] is the spec-gated plan builder), and the only
    * shuffled rows are the flagged-id aggregate's. Batch cost is
    * |batch| × |probed cells|, never corpus size. */
  def appendBatchSemantic(spark: SparkSession, batch0: DataFrame,
      version: Long, corpusDir: String, vecDir: String,
      cents: Seq[Seq[Double]], threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): Long = {
    import graft.pipeline.{Dedup, Similarity}
    require(cents.nonEmpty,
      "appendBatchSemantic needs a trained coarse quantizer (cents)")
    // one pinned frame of (id, vector, norm, cell): feeds the
    // candidate join's broadcast side, the survivor filter, and the
    // sidecar append. Lazy: the first consumer is single either way
    // (the cell-set collect when a corpus exists, else the survivor
    // count) and materializes the cache in its own job
    val (arr, pin) = Dedup.pinLazy(
      Similarity.assignCells(
        batch0.select(col(idCol).as("_id"), col(vecCol).as("_v")),
        cents, "_v")
        .withColumn("_nrm", Similarity.norm(col("_v"))))
    try {
      val flagged: DataFrame =
        if (!exists(spark, vecDir)) {
          // an absent sidecar with a surviving maintenance sibling is
          // a crashed requantize's mid-swap state, NOT an empty corpus
          // — treating it as empty would accept every paraphrase in
          // the batch; re-run requantizeVectors (its entry heals) first
          requireNoMidSwap(spark, vecDir,
            Seq(".trash", ".requantize"), "requantizeVectors")
          arr.select(col("_id")).limit(0) // typed-empty: no corpus yet
        } else {
          // the batch's cell set, collected driver-side (≤ kCells
          // ints off the pinned frame): pushed as a row predicate so
          // the cell-clustered sidecar files prune row groups
          val batchCells = arr.select(col("cell")).distinct()
            .collect().map(_.getInt(0))
          val accepted = spark.read.parquet(vecDir)
            .where(col("version") < version)
            .where(col("cell").isin(batchCells.map(c => c: Any): _*))
            .select(col("_rv"), col("_rnrm"), col("cell"))
          SemanticPlan.flagged(arr, accepted, threshold)
        }
      val survivors = arr.join(broadcast(flagged), Seq("_id"), "left_anti")
      // lazy: the count is the single next consumer (pinLazy rule)
      val (pinnedSurv, survPin) = Dedup.pinLazy(survivors)
      try {
        val n = pinnedSurv.count()
        if (n > 0) {
          writeVersioned(version)(
            batch0.join(broadcast(pinnedSurv.select(
              col("_id").as(idCol))), Seq(idCol), "left_semi"),
            corpusDir)
          writeVersioned(version)(
            pinnedSurv.select(col("_v").as("_rv"),
                col("_nrm").as("_rnrm"), col("cell"))
              // cluster by cell so the next batch's pushed cell-IN
              // predicate skips row groups on min/max stats
              .repartition(col("cell"))
              .sortWithinPartitions(col("cell")),
            vecDir)
        }
        n
      } finally survPin.release()
    } finally pin.release()
  }

  /** The semantic candidate plan, factored out so its physical shape
    * is spec-gateable (StreamingSemanticDedupSpec asserts the
    * corpus-sized `accepted` side is NEVER shuffled: the candidate
    * join is a BroadcastHashJoin with the sidecar streaming, and the
    * only exchange carries flagged ids).
    *
    * `arr` is the pinned batch frame (_id, _v, _nrm, cell);
    * `accepted` the sidecar rows (_rv, _rnrm, cell). Returns the
    * distinct `_id`s within cosine `threshold` of an accepted
    * vector — the identical round-to-6 cosine the batch operator
    * ([[graft.pipeline.Similarity.crossCosinePairs]]) computes. */
  private[graft] object SemanticPlan {
    import graft.pipeline.Similarity
    def flagged(arr: DataFrame, accepted: DataFrame,
        threshold: Double): DataFrame =
      accepted
        .join(broadcast(arr), Seq("cell"))
        .where(round(Similarity.dot(col("_v"), col("_rv"))
          / (col("_nrm") * col("_rnrm")), 6) >= threshold)
        .select(col("_id")).distinct()
  }

  /** Start the streaming semantic dedup ([[appendBatchSemantic]] per
    * micro-batch; same checkpoint/replay contract as [[start]]). */
  def startSemantic(spark: SparkSession, stream: DataFrame,
      corpusDir: String, vecDir: String, checkpointDir: String,
      cents: Seq[Seq[Double]], threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatchSemantic(spark, batch, batchId + 1, corpusDir,
          vecDir, cents, threshold, idCol, vecCol)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Start the streaming near-dup dedup ([[appendBatchNearDup]] per
    * micro-batch; same checkpoint/replay contract as [[start]]). */
  def startNearDup(spark: SparkSession, stream: DataFrame,
      corpusDir: String, postingsDir: String, checkpointDir: String,
      k: Int = 3, threshold: Double = 0.5,
      maxDf: Int = Int.MaxValue, nBuckets: Int = 256,
      idCol: String = "doc_id", textCol: String = "text")
      : StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatchNearDup(spark, batch, batchId + 1, corpusDir,
          postingsDir, k, threshold, maxDf, nBuckets, idCol, textCol)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Compact the tier sidecar: after many batches the tier holds one
    * partial row-set per version; fold them to ONE bit_or-merged row
    * per bucket (≤ nBuckets rows total, landing in the max version's
    * partition). Membership answers are unchanged — bit_or is
    * associative — and the next batch's prefilter reads one row per
    * bucket instead of one per (bucket, version).
    *
    * Crash-safe in place: the merged rows (control-plane kilobytes —
    * collected to the driver, which also severs any read-while-write
    * overlap) are first APPENDED into the second-newest version's
    * partition dir, then the superseded version dirs and the
    * partition's old part files are deleted. The NEWEST version is
    * never folded: its stream batch may not have committed its
    * checkpoint yet, and a replay of it re-reads `version < maxV` —
    * which must still see all older membership bits, not an empty
    * tier. The tier path never disappears (the old
    * write-new-then-flip left a window where a concurrent append's
    * exists() check saw no tier and bypassed dedup entirely), and a
    * crash at any step leaves redundant-but-correct bits that the
    * next compaction folds. Run single-writer with respect to
    * appendBatch: deleting files under a concurrently planning read
    * can fail that batch (correctness is unaffected — it would fail,
    * not mis-dedup — but schedule compaction between batches). */
  def compactTier(spark: SparkSession, tierDir: String,
      nWords: Int = 4): Unit = {
    if (!exists(spark, tierDir)) return
    val tier = spark.read.parquet(tierDir)
    val versions = tier.select(col("version").cast("long"))
      .distinct().collect().map(_.getLong(0)).sorted
    // Fold only versions STRICTLY OLDER than the newest: the newest
    // version may belong to a stream batch whose checkpoint commit
    // has not landed yet, and an at-least-once replay of that batch
    // re-reads the tier with `version < maxV` — folding maxV's
    // partials downward would make that read come back EMPTY and
    // re-accept every historical duplicate. Versions with a
    // successor are committed by construction (the stream issues
    // versions monotonically), so they are safe to merge.
    if (versions.length <= 2) return // nothing strictly-older to fold
    val olds = versions.init
    val keepV = olds.last
    val merged = tier.where(col("version") < versions.last)
      .groupBy(col("bloom_bucket"))
      .agg(expr("bit_or(bloom_w0)").as("bloom_w0"),
        (1 until nWords).map(x =>
          expr(s"bit_or(bloom_w$x)").as(s"bloom_w$x")): _*)
    val local = merged.collect() // ≤ nBuckets rows of longs
    val fs = new org.apache.hadoop.fs.Path(tierDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = new org.apache.hadoop.fs.Path(s"$tierDir/version=$keepV")
    val superseded = fs.listStatus(part).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    spark.createDataFrame(
        java.util.Arrays.asList(local: _*), merged.schema)
      .coalesce(1).write.mode("append").parquet(part.toString)
    graft.util.Maint.step("compactTier", "appended")
    olds.init.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$tierDir/version=$v"),
        true)
    }
    graft.util.Maint.step("compactTier", "olds-deleted")
    superseded.foreach(fs.delete(_, false))
    graft.util.Maint.step("compactTier", "committed")
    ()
  }

  /** Compact the fingerprint sidecar: [[appendBatch]] leaves one
    * `version=N` partition per batch forever, so a long-lived stream
    * accumulates thousands of small partitions and every batch's
    * membership join pays the file-listing and footer overhead. Fold
    * all fingerprints of versions STRICTLY OLDER than the newest into
    * the second-newest version's partition — same fold-only-committed
    * rule as [[compactTier]]: the newest version's stream batch may
    * not have committed its checkpoint, and its replay re-reads
    * `version < N`, which must still see every older fingerprint.
    * Membership answers are unchanged (the fold moves rows, it never
    * drops or alters a fingerprint; `version` collapsing to `keepV`
    * is invisible to the `version < N` reads).
    *
    * Unlike the tier (kilobytes, driver-collected), fingerprints are
    * corpus-sized, so the fold is distributed, via the
    * duplicates-harmless protocol ([[graft.util.Maint]]): write the
    * merged rows to a temp dir (Spark refuses to write a path it
    * reads), RENAME the part files into the keep partition (UUID part
    * names cannot collide), then delete the superseded version dirs
    * and the keep partition's pre-fold files. A crash between steps
    * leaves redundant-but-correct rows — duplicate fingerprints are
    * harmless to the membership semi-join and the next compaction
    * folds them. Output files are SIZED (`ceil(bytes / target)`, the
    * Ingest.optimize rule) so the fold never collapses the sidecar's
    * scan parallelism to one AQE-coalesced task's worth of files.
    * Single-writer with respect to appendBatch, like compactTier. */
  def compactFp(spark: SparkSession, fpDir: String,
      targetBytesPerFile: Long = 128L << 20): Unit =
    foldHarmless(spark, fpDir, "compactFp", targetBytesPerFile) {
      (merged, nFiles) =>
        // membership probes are a semi-join on _fp (no pushed range
        // predicate), so even spread is all the layout needs
        merged.repartitionByRange(nFiles, col("_fp"))
    }

  /** The shared duplicates-harmless version fold ([[compactFp]],
    * [[compactVectors]]): fold all rows of versions strictly older
    * than the newest into the second-newest version's partition.
    * `shape` re-clusters the merged frame into `nFiles` output files
    * (sized from the folded sources' bytes — [[graft.util.Maint
    * .sizedFileCount]]). Crash windows between the protocol steps
    * leave redundant-but-correct rows by precondition (the caller's
    * read path tolerates duplicates); [[graft.util.Maint]] injects
    * test crashes at each step. */
  private def foldHarmless(spark: SparkSession, dir: String,
      verb: String, targetBytesPerFile: Long)(
      shape: (DataFrame, Int) => DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    import graft.util.Maint
    if (!exists(spark, dir)) return
    val df = spark.read.parquet(dir)
    val versions = df.select(col("version").cast("long"))
      .distinct().collect().map(_.getLong(0)).sorted
    if (versions.length <= 2) return // nothing strictly-older to fold
    val keepV = versions.init.last
    val dataCols = df.columns.filterNot(_ == "version").map(col)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nFiles = Maint.sizedFileCount(
      Maint.parquetBytes(fs,
        versions.init.map(v => new Path(s"$dir/version=$v")).toSeq),
      targetBytesPerFile)
    val merged = shape(
      df.where(col("version") < versions.last).select(dataCols: _*),
      nFiles)
    val part = new Path(s"$dir/version=$keepV")
    val superseded = fs.listStatus(part).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    val tmp = new Path(s"$dir/.compact-tmp-$keepV")
    fs.delete(tmp, true)
    Maint.step(verb, "cleaned")
    merged.write.mode("overwrite").parquet(tmp.toString)
    Maint.step(verb, "built")
    Maint.renamePartsInto(fs, tmp, part, verb)
    versions.init.init.foreach { v =>
      fs.delete(new Path(s"$dir/version=$v"), true)
    }
    Maint.step(verb, "olds-deleted")
    superseded.foreach(fs.delete(_, false))
    Maint.step(verb, "committed")
    ()
  }

  /** Compact the shingle-postings sidecar: [[appendBatchNearDup]]
    * leaves one `version=N` partition per batch forever, so a
    * ten-thousand-batch history pays file-listing and footer overhead
    * proportional to history length on EVERY batch. Fold all postings
    * of versions STRICTLY OLDER than the newest into the
    * second-newest version's partition — the fold-only-committed rule
    * shared with [[compactTier]]/[[compactFp]]: the newest version's
    * stream batch may not have committed its checkpoint, and its
    * replay re-reads `version < N`, which must still see every older
    * posting. The rewrite re-clusters the keep partition by
    * (`bucket`, `sh`), so the next batch's pushed bucket-IN predicate
    * prunes row groups exactly as the append path's layout does.
    *
    * Protocol: whole-root write-new-then-FLIP (tmp sibling → rename
    * root away → rename tmp in), NOT [[compactFp]]'s
    * rename-parts-into-partition. The fingerprint fold tolerates its
    * crash windows because duplicate fingerprint rows are harmless to
    * a membership SEMI-join; duplicate POSTINGS rows are not — the
    * candidate aggregate counts rows into the intersection size `_c`,
    * so a crash that left a posting both in its old version dir and
    * merged into the keep partition would inflate measured Jaccard
    * and silently DROP documents that are not near-duplicates. The
    * root flip has no such window: every state exposes either the
    * complete old tree or the complete new one. Heal-at-entry is the
    * scrubSidecarVersion discipline — live absent + trash present ⇒
    * restore the original (the rewrite is parameter-free, but restore
    * + rerun is uniformly correct and keeps one rule), discard tmp,
    * re-run; live absent + only tmp ⇒ fail loudly. [[appendBatchNearDup]]
    * guards the same state at ITS entry, so a crashed compaction can
    * never make a batch mistake the mid-swap absence for an empty
    * corpus and accept everything. Single-writer with respect to
    * appendBatchNearDup, like every compaction here. */
  def compactPostings(spark: SparkSession, postingsDir: String,
      targetBytesPerFile: Long = 128L << 20): Unit = {
    import org.apache.hadoop.fs.Path
    import graft.util.Maint
    val root = new Path(postingsDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = root.suffix(".compact")
    val trash = root.suffix(".compact-trash")
    if (!Maint.healAtEntry(fs, root, tmp, trash, "compactPostings",
        live = exists(spark, postingsDir)))
      return // never written — nothing to compact
    Maint.cleanSiblings(fs, tmp, trash, "compactPostings")
    val posts = spark.read.parquet(postingsDir)
    val versions = posts.select(col("version").cast("long"))
      .distinct().collect().map(_.getLong(0)).sorted
    if (versions.length <= 2) return // nothing strictly-older to fold
    val maxV = versions.last
    val keepV = versions.init.last
    // output files SIZED like Ingest.optimize (ceil(bytes / target)):
    // an unsized repartition(cols) lets AQE coalesce the fold into 1-2
    // files and the next batches' candidate joins scan the corpus side
    // on 1-2 tasks — file-count-bounded parallelism (measured: the
    // 80-batch probe's compacted semantic curve ran SLOWER than
    // uncompacted from exactly this). Range partitioning on the
    // cluster keys keeps each file a contiguous (version, bucket, sh)
    // slab, so the pushed bucket-IN predicate prunes whole FILES on
    // footer min/max, not just row groups.
    val nFiles = Maint.sizedFileCount(
      Maint.parquetBytes(fs,
        versions.map(v => new Path(s"$postingsDir/version=$v")).toSeq),
      targetBytesPerFile)
    posts
      .withColumn("version",
        when(col("version").cast("long") < maxV, lit(keepV))
          .otherwise(col("version").cast("long")))
      .repartitionByRange(nFiles, col("version"), col("bucket"),
        col("sh"))
      .sortWithinPartitions(col("version"), col("bucket"), col("sh"))
      .write.partitionBy("version").parquet(tmp.toString)
    Maint.flipNow(fs, root, tmp, trash, "compactPostings")
    ()
  }

  /** Compact the accepted-vector sidecar: fold all vectors of
    * versions STRICTLY OLDER than the newest into the second-newest
    * version's partition (the fold-only-committed rule — see
    * [[compactTier]]) so long [[appendBatchSemantic]] histories keep
    * flat per-batch listing overhead. The fold moves rows and
    * re-clusters them by `cell`; it never drops or alters a vector,
    * and `version` collapsing to `keepV` is invisible to the
    * `version < N` reads.
    *
    * Protocol: [[compactFp]]'s rename-parts-into-partition — safe
    * here, unlike the postings fold, because the semantic flag plan
    * ends in `select(_id).distinct()`: a crash window that leaves a
    * vector both in its old version dir and in the keep partition
    * costs duplicate candidate rows the distinct collapses, never a
    * changed answer. The root never vanishes, so no batch can
    * mistake a mid-compaction state for an empty corpus. Superseded
    * files delete only after the merged rows land. The fold also
    * `distinct()`s the merged rows: a tolerated crash window's
    * duplicates are answer-invisible but would otherwise survive
    * EVERY later fold and grow the sidecar monotonically across
    * repeated crashes — full-row dedup at fold time collapses them
    * (exact: a crash duplicates bit-identical rows, and two genuinely
    * identical accepted vectors are interchangeable for membership).
    * Output files are SIZED (`ceil(bytes / target)`) and
    * range-clustered by (cell, norm) so the pushed cell-IN predicate
    * prunes whole files while scan parallelism survives the fold.
    * Single-writer with respect to appendBatchSemantic. */
  def compactVectors(spark: SparkSession, vecDir: String,
      targetBytesPerFile: Long = 128L << 20): Unit =
    foldHarmless(spark, vecDir, "compactVectors", targetBytesPerFile) {
      (merged, nFiles) =>
        merged.distinct()
          .repartitionByRange(nFiles, col("cell"), col("_rnrm"))
          .sortWithinPartitions(col("cell"))
    }

  /** Re-quantize the accepted-vector sidecar under a NEW coarse
    * quantizer — the streaming face of
    * [[graft.pipeline.Similarity.retrainIvfIndex]], and the
    * maintenance step [[appendBatchSemantic]]'s frozen-quantizer
    * contract defers to under distribution drift (stale cells stop
    * pruning; they never break correctness). STOPPED-STREAM,
    * single-writer: every batch after this must pass the new `cents`,
    * or cell assignments disagree and the candidate join loses pairs
    * — the coordinated swap is the point. Vectors and frozen norms
    * are untouched (membership answers cannot change); only `cell` is
    * recomputed, with the whole sidecar rewritten version-partitioned
    * and cell-clustered exactly like the append path writes it, via
    * write-new-then-FLIP on the sidecar root (the
    * [[graft.pipeline.Similarity.compactIvfVectors]] swap contract: a
    * concurrent read fails loudly, never sees half a layout). The
    * `version` column survives verbatim so checkpoint-replay's
    * `version < N` reads still see every accepted vector. */
  def requantizeVectors(spark: SparkSession, vecDir: String,
      cents: Seq[Seq[Double]]): Unit = {
    import graft.pipeline.Similarity
    require(cents.nonEmpty, "requantizeVectors needs a quantizer")
    val root = new org.apache.hadoop.fs.Path(vecDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$vecDir.requantize")
    val trash = new org.apache.hadoop.fs.Path(s"$vecDir.trash")
    // an absent live sidecar WITH a surviving trash sibling is this
    // verb's own mid-swap crash state — a bare return would report a
    // 'successful' requantize while every accepted vector sat stranded
    // in the trash forever (membership candidate joins go silently
    // empty). Maint restores the ORIGINAL and this call re-quantizes
    // under ITS quantizer — never completing a crashed attempt's tmp,
    // which may have been built under a different one.
    if (!graft.util.Maint.healAtEntry(fs, root, tmp, trash,
        "requantizeVectors", live = exists(spark, vecDir)))
      return // never written — nothing to requantize
    graft.util.Maint.cleanSiblings(fs, tmp, trash, "requantizeVectors")
    Similarity.assignCells(
        spark.read.parquet(vecDir).drop("cell"), cents, "_rv")
      .repartition(col("version"), col("cell"))
      .sortWithinPartitions(col("version"), col("cell"))
      .write.partitionBy("version").parquet(tmp.toString)
    graft.util.Maint.flipNow(fs, root, tmp, trash, "requantizeVectors")
    ()
  }

  /** Fail loudly when an ABSENT sidecar root has a surviving
    * maintenance sibling (write-new-then-flip trash/tmp): that is a
    * crashed maintenance verb's mid-swap state, and the append faces
    * must never mistake it for an empty corpus — silently accepting a
    * whole batch of duplicates is the one unrecoverable outcome. The
    * named verb's own entry heal restores the root. */
  private def requireNoMidSwap(spark: SparkSession, dir: String,
      suffixes: Seq[String], healVerb: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    suffixes.foreach { s =>
      val sib = p.suffix(s)
      if (fs.exists(sib))
        throw new java.io.IOException(
          s"$dir is absent but $sib survives — a crashed maintenance " +
            s"swap, not an empty corpus; run $healVerb to heal before " +
            "appending")
    }
  }

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      st.getPath.getName.endsWith(".parquet") ||
        (st.isDirectory && st.getPath.getName.startsWith("version="))
    }
  }
}
