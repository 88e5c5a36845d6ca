package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * `Dataset.sample` (and any RNG-based sampler) is partitioning- and
  * run-dependent — a re-run or a repartition yields a different
  * subset, which is unacceptable for reproducible training corpora or
  * for train/test contamination guarantees. Here membership is a pure
  * function of (salt, id): the first 8 hex digits of
  * `md5(salt ":" id)` — a uniform 32-bit bucket — compared against a
  * hex cutoff. Same id + same salt = same decision on any engine, any
  * partitioning, any run; changing the salt draws an independent
  * sample. Lexicographic comparison of fixed-width lowercase hex
  * equals numeric comparison, so the predicate is a plain string
  * compare that pushes down to the scan and is replicated verbatim in
  * SQL oracles (the repo's cross-engine-hash rule: md5 only).
  *
  * Shuffle-free: both operators are row-local projections/filters.
  * At 100 TB a split is a column stamped at ingest (write once,
  * partition or filter on it later); a sample is a pushed-down filter
  * that never materializes the rejected rows.
  */
object Sampling {

  /** Uniform 32-bit bucket of (salt, id) as 8 lowercase hex digits. */
  def hashBucket(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 8)

  /** Driver-side twin of [[hashBucket]] — byte-identical framing and
    * hex rendering, for control-plane callers (probes choosing a
    * splice position) that need a row's `_pk` without a Spark job.
    * One copy of the formula on each face, both defined HERE. */
  def hashBucketLocal(id: String, salt: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$id".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString.take(8)

  /** Stamp the packing-lane columns shared by [[packBudget]] and
    * [[packSequences]]: `_pk` (the 8-hex hash-order key) and
    * `pack_bucket` = pk mod nBuckets. ONE copy of the lane contract —
    * the two packers (and their SQL oracles) must agree bit-for-bit
    * on lane membership forever, so the formula lives here only.
    * ([[hashBucket]] already returns exactly 8 hex chars, so no
    * substring before the base conversion.) */
  private def withLane(df: DataFrame, nBuckets: Int, idCol: String,
      salt: String): DataFrame =
    df.withColumn("_pk", hashBucket(col(idCol), salt))
      .withColumn("pack_bucket",
        pmod(conv(col("_pk"), 16, 10).cast("long"),
          lit(nBuckets.toLong)))

  /** The pack-lane id of a document — THE lane formula ([[withLane]]
    * derives from the same [[hashBucket]]), exposed so incremental
    * faces ([[graft.streaming.SequenceShards]]) can route documents
    * to the lanes a batch [[packSequences]] would use, bit for bit. */
  def laneOf(id: Column, nBuckets: Int, salt: String = "graft"): Column =
    pmod(conv(hashBucket(id, salt), 16, 10).cast("long"),
      lit(nBuckets.toLong))

  /** Cutoff hex literal covering `fraction` of the 32-bit space.
    * Exposed so SQL oracles embed the IDENTICAL literal. */
  def hexCutoff(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0, 1]: $fraction")
    f"${math.round(fraction * 4294967296.0).min(4294967295L)}%08x"
  }

  /** Keep a deterministic `fraction` of rows, decided per id. */
  def sample(df: DataFrame, fraction: Double, idCol: String = "doc_id",
      salt: String = "graft"): DataFrame =
    if (fraction >= 1.0) df
    else df.where(hashBucket(col(idCol), salt) < lit(hexCutoff(fraction)))

  /** Per-stratum deterministic sampling: each stratum value keeps its
    * own fraction of rows, strata not listed keep `default`. This is
    * the mixture-weighting primitive — downsample over-represented
    * sources/languages to a target corpus composition (the
    * [[graft.pipeline.TextOps.corpusStats]] report supplies the
    * denominators). Same membership guarantees as [[sample]]: pure
    * function of (salt, id), engine- and partitioning-independent.
    * Still a single row-local filter — the per-stratum cutoff is a
    * CASE over the stratum column, no shuffle, no per-stratum jobs. */
  def stratified(df: DataFrame, strataCol: String,
      rates: Seq[(String, Double)], default: Double = 1.0,
      idCol: String = "doc_id", salt: String = "graft"): DataFrame = {
    val cutoff = rates.foldLeft(lit(hexCutoff(default)): Column) {
      case (e, (k, r)) =>
        when(col(strataCol) === k, lit(hexCutoff(r))).otherwise(e)
    }
    df.where(hashBucket(col(idCol), salt) < cutoff)
  }

  /** Stamp every row with a named split ("train"/"valid"/"test"…) by
    * cumulative weight cutoffs over the hash bucket. Weights must sum
    * to 1 (±1e-9); every row lands in exactly one split. */
  def split(df: DataFrame, weights: Seq[(String, Double)],
      idCol: String = "doc_id", salt: String = "graft"): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1: $weights")
    val bucket = hashBucket(col(idCol), salt)
    val cumulative = weights.scanLeft(0.0)(_ + _._2).tail
    // last split is the unconditional otherwise — no cutoff rounding
    // can ever leave a row unassigned
    val labeled = weights.init.zip(cumulative.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), cum)) =>
        val cond = bucket < lit(hexCutoff(cum))
        Some(acc match {
          case None    => when(cond, lit(name))
          case Some(c) => c.when(cond, lit(name))
        })
      } match {
        case None    => lit(weights.head._1) // single split
        case Some(c) => c.otherwise(lit(weights.last._1))
      }
    df.withColumn("split", labeled)
  }

  /** Keep each row with probability equal to its own `weight` column
    * (clamped to [0, 1]) — quality-proportional downsampling: good
    * documents survive at their score, bad ones thin out, and the
    * decision stays a pure function of (salt, id) like [[sample]].
    * The comparison runs in integer space (hash bucket as a long vs
    * `floor(weight * 2^32)`) so both engines evaluate the identical
    * IEEE product and floor — no hex-literal rounding per row. Still
    * one shuffle-free pushable filter. */
  def weighted(df: DataFrame, weightCol: String,
      idCol: String = "doc_id", salt: String = "graft"): DataFrame = {
    val w = least(greatest(col(weightCol).cast("double"), lit(0.0)),
      lit(1.0))
    val bucket = conv(hashBucket(col(idCol), salt), 16, 10).cast("long")
    df.where(bucket < floor(w * lit(4294967296.0)).cast("long"))
  }

  /** Pack documents into ~`budget`-token shards — training-batch /
    * shard construction (documents are never split; a shard holds the
    * docs whose cumulative token count starts inside its budget
    * window). Deterministic: docs are ordered by (hash bucket, id)
    * inside `nBuckets` hash partitions, so the packing is a pure
    * function of (salt, ids, token counts) — same shards on any
    * engine, any run.
    *
    * 100 TB shape: a GLOBAL running sum would serialize the corpus
    * through one partition; instead each of the `nBuckets` hash
    * buckets packs independently (one window over its own rows), and
    * the shard key is (bucket, shard_in_bucket). Buckets are
    * hash-uniform, so shard fill is uniform too; nBuckets scales with
    * the cluster, and the hash order doubles as the corpus shuffle
    * every training pipeline wants anyway. Output adds `pack_bucket`,
    * `pack_shard` (0-based within bucket), and `n_tokens`. */
  def packBudget(df: DataFrame, budget: Long, nBuckets: Int,
      tokensCol: String, idCol: String = "doc_id",
      salt: String = "graft"): DataFrame = {
    require(budget >= 1, "budget >= 1 token")
    require(nBuckets >= 1, "nBuckets >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pack_bucket"))
      .orderBy(col("_pk"), col(idCol))
    withLane(df, nBuckets, idCol, salt)
      .withColumn("_cum", sum(col(tokensCol)).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
      .withColumn("pack_shard",
        expr(s"(_cum - $tokensCol) div ${budget}L"))
      .withColumn("n_tokens", col(tokensCol).cast("long"))
      .drop("_pk", "_cum")
  }

  /** Chunk documents into fixed-length token windows with stride —
    * the sequence-shaping step between curation and batching: a
    * pretraining pipeline cuts long documents into `maxLen`-token
    * training sequences, overlapping by `maxLen - stride` tokens so
    * no boundary context is lost. Emits one row per window:
    * (id, chunk_idx, chunk_start, n_tokens, chunk_md5) where `chunk_md5`
    * fingerprints the space-joined window (the payload face is the
    * same slice un-hashed). Windows start at 0, stride, 2·stride, …;
    * a window is kept iff it is the first or the previous window did
    * not already reach the document's end — so every token is covered
    * exactly once by the final ragged window and no fully-redundant
    * suffix windows are emitted.
    *
    * Deterministic and engine-exact (slice + join + md5 of the same
    * token array). Shuffle-free: one projection + one explode, at
    * full scan parallelism — at 100 TB this is a map-only stage whose
    * output feeds [[packBudget]].
    */
  def chunk(df: DataFrame, maxLen: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1: $maxLen")
    require(stride >= 1 && stride <= maxLen,
      s"stride must be in [1, maxLen]: $stride")
    df.select(col(idCol), TextOps.tokens(lower(col(textCol)))
        .as("_toks"))
      .where(size(col("_toks")) >= 1)
      .withColumn("_start", explode(
        sequence(lit(0), size(col("_toks")) - 1, lit(stride))))
      .where(col("_start") === 0 ||
        col("_start") + lit(maxLen - stride) < size(col("_toks")))
      .withColumn("_chunk",
        slice(col("_toks"), col("_start") + 1, lit(maxLen)))
      .select(col(idCol),
        expr(s"CAST(_start div $stride AS BIGINT)").as("chunk_idx"),
        col("_start").cast("long").as("chunk_start"),
        size(col("_chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("_chunk"))).as("chunk_md5"))
  }

  /** [[chunk]] over a pre-tokenized ID-SEQUENCE column — the subword
    * face: window boundaries measured in REAL model tokens
    * ([[Bpe.encodeIds]]' `bpe_ids`), not whitespace words, which is
    * what a pretraining batcher actually consumes (whitespace windows
    * misplace boundaries 2-4× on code/CJK exactly like the counts
    * do). Same start-window rule as [[chunk]] (starts at 0, stride,
    * …; a window is kept iff it is the first or the previous window
    * did not already reach the sequence's end); emits the WINDOW
    * PAYLOAD — (idCol, chunk_idx, chunk_start, n_ids, ids_csv), the
    * csv face so the cross-engine oracle hashes stably. Empty
    * sequences emit no windows. Shuffle-free map-only stage, output
    * ∝ corpus tokens — composes with [[packBudget]] on `n_ids`. */
  def chunkIds(df: DataFrame, maxLen: Int, stride: Int,
      idCol: String = "doc_id", idsCol: String = "bpe_ids"): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1: $maxLen")
    require(stride >= 1 && stride <= maxLen,
      s"stride must be in [1, maxLen]: $stride")
    df.select(col(idCol), col(idsCol).as("_ids"))
      .where(size(col("_ids")) >= 1)
      .withColumn("_start", explode(
        sequence(lit(0), size(col("_ids")) - 1, lit(stride))))
      .where(col("_start") === 0 ||
        col("_start") + lit(maxLen - stride) < size(col("_ids")))
      .withColumn("_chunk",
        slice(col("_ids"), col("_start") + 1, lit(maxLen)))
      .select(col(idCol),
        expr(s"CAST(_start div $stride AS BIGINT)").as("chunk_idx"),
        col("_start").cast("long").as("chunk_start"),
        size(col("_chunk")).cast("long").as("n_ids"),
        array_join(transform(col("_chunk"), x => x.cast("string")),
          ",").as("ids_csv"))
  }

  /** Pack per-document token-id sequences into fixed-length training
    * sequences — the final dataloader step of a pretraining pipeline
    * (GPT-style "concatenate and chunk"): within each of `nBuckets`
    * hash lanes, documents concatenate in deterministic (hash, id)
    * order into one token stream with `eosId` appended after every
    * document (the boundary token the model learns to attend across),
    * and the stream splits into back-to-back sequences of EXACTLY
    * `seqLen` ids — sequences routinely span document boundaries,
    * which is precisely what [[chunkIds]] (within-doc windows) and
    * [[packBudget]] (whole-doc shards) cannot express. Each lane's
    * trailing partial sequence is dropped (a fixed-shape batch can't
    * consume it); documents with empty id sequences are dropped
    * (nothing to emit — they would contribute a bare EOS no model
    * sees a document behind). Output: (pack_bucket, seq_idx — 0-based
    * within lane, n_docs — documents contributing ≥1 token including
    * EOS-only tails, starts_csv — each contributing document
    * fragment's start offset WITHIN the sequence in stream order (a
    * carried-over head reads 0; an EOS-only tail reads its EOS
    * position): together with the in-stream EOS ids these are the
    * boundaries an attention-mask-reset / loss-mask consumer needs,
    * cf. the `reset_attention_mask` option of published pretraining
    * dataloaders, ids_csv — the seqLen ids comma-joined, the
    * cross-engine-stable array face). starts_csv falls out of the
    * same fragment sort that assembles ids_csv — zero extra
    * exchanges or passes.
    *
    * Deterministic: lane = hash(salt, id) mod nBuckets, order within
    * a lane = (hash, id) — a pure function of (salt, ids, id
    * sequences) on any engine, any partitioning ([[packBudget]]'s
    * guarantee, extended to token granularity).
    *
    * 100 TB shape: a GLOBAL stream would serialize the corpus through
    * one cumsum; instead each lane packs independently (the
    * [[packBudget]] lane discipline — nBuckets scales with the
    * cluster). One window computes per-doc stream offsets from doc
    * LENGTHS (the id arrays ride through the lane sort once — the
    * same volume any shuffle of the encoded corpus moves, and
    * carrying them beats a narrow-frame offset pass that would
    * re-execute the upstream encode per consumer, the
    * multi-consumer-subtree rule); a bounded explode emits one
    * SLICE per (document × overlapped sequence) — total work and
    * volume ∝ corpus tokens, never quadratic; and the final assembly
    * groups by (lane, seq_idx), where every group is exactly seqLen
    * tokens — skew-free by construction (no mega-key exists: the
    * hot-key shape dedup guards against cannot occur here). ONE
    * shuffle end to end: the assembly's grouping keys are clustered
    * by the lane window's hashpartitioning(pack_bucket), so
    * EnsureRequirements reuses the lane exchange (spec-gated). */
  /** Seed-deterministic PER-LANE epoch shuffle — the dataloader's
    * between-epochs reordering: each epoch visits every row exactly
    * once in a pseudo-random order that is a pure function of
    * (salt, epoch, lane, keys) — md5-ranked, NO RNG state — so any
    * worker reproduces any epoch's slice independently and a resumed
    * job re-derives the exact order it crashed in (the property
    * published dataloaders get from seeded permutations, here with
    * the engine-portable hash the whole library uses). Appends
    * `epoch_pos` (1-based within the lane).
    *
    * Scale shape: the position is a row_number over a LANE window —
    * never a global single-partition sort; lanes shuffle
    * independently (the dataloader's shard-local shuffle, with the
    * shard visit order a driver-side permutation of the lane ids —
    * control-plane, not this verb's job). Applied directly to
    * [[packSequences]] output, the window's ClusteredDistribution is
    * satisfied by the pack lane's hashpartitioning, so the whole
    * pack+shuffle pipeline still plans ONE exchange (spec-gated).
    * md5 ties (never observed; 128-bit) break on the keys, so the
    * order is total and deterministic either way.
    *
    * Determinism contract, ENFORCED: the rank hash includes the LANE
    * (the doc's claim that the order is a function of lane is real,
    * not incidental), and a null lane or key fails loudly at run time
    * — `concat_ws` silently SKIPS nulls, so a null would alias
    * distinct hash inputs and make `epoch_pos` nondeterministic
    * across rebuilds, breaking exactly the resume-reproducibility
    * this verb exists for. Key-tuple UNIQUENESS within a lane is the
    * remaining caller-owned precondition (keys are ids by contract):
    * two rows with identical keys get identical ranks and their
    * relative epoch_pos is engine-arbitrary — pass a distinguishing
    * key column if the data can carry duplicates. */
  def epochShuffle(df: DataFrame, epoch: Long, laneCol: String,
      keyCols: Seq[String], salt: String = "graft"): DataFrame = {
    require(keyCols.nonEmpty, "epochShuffle needs ordering key columns")
    import org.apache.spark.sql.expressions.Window
    def guarded(name: String): Column = coalesce(
      col(name).cast("string"),
      raise_error(lit(s"epochShuffle: null $name — the seed-" +
        "deterministic permutation needs non-null lane and key values"))
        .cast("string"))
    val rank = md5(concat_ws(":",
      (Seq(lit(salt), lit(epoch.toString), guarded(laneCol)) ++
        keyCols.map(guarded)): _*))
    val w = Window.partitionBy(col(laneCol))
      .orderBy(rank +: keyCols.map(col): _*)
    df.withColumn("epoch_pos", row_number().over(w).cast("long"))
  }

  /** Driver-side per-epoch LANE (shard) permutation — the companion
    * of [[epochShuffle]], so a dataloader consumes BOTH orders from
    * one discipline: visit the shards in `epochLaneOrder(n, epoch)`
    * order, and within each shard read rows by `epoch_pos`. Ranks
    * lane l by (md5("salt:epoch:l"), l) — the identical engine-
    * portable hash family epochShuffle uses for rows (hex compares
    * byte-wise on every engine), NO RNG state: any worker re-derives
    * any epoch's visit order independently, and an SQL oracle
    * re-derives it with the engine's own md5. Control-plane by
    * design (nLanes ints); returns the lane ids in visit order. */
  def epochLaneOrder(nLanes: Int, epoch: Long,
      salt: String = "graft"): Seq[Long] = {
    require(nLanes >= 1, s"nLanes >= 1: $nLanes")
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
    (0L until nLanes.toLong)
      .sortBy(l => (hex(s"$salt:$epoch:$l"), l))
  }

  /** [[epochLaneOrder]] as a row-local column over a lane id —
    * the driver-derived permutation INVERTED into a flat array
    * literal indexed by lane (1-based visit position), so stamping
    * the order onto packed output costs ZERO exchanges and the pack
    * pipeline's one-exchange plan survives. WIDE, not deep, by
    * design: the obvious nLanes-deep when/otherwise fold hits
    * Catalyst's recursive-transform StackOverflowError near ~1000
    * branches (the expression-DEPTH wall — see the BPE merge-table
    * rule), and nLanes scales with the cluster, so a thousands-of-
    * lanes store must plan through a depth-1 `element_at` lookup.
    * Lanes outside [0, nLanes) map to null (guarded BEFORE the
    * lookup — ANSI element_at aborts on out-of-bounds, and CaseWhen
    * only evaluates the matched branch). */
  def epochLaneOrderCol(lane: Column, nLanes: Int, epoch: Long,
      salt: String = "graft"): Column = {
    val visitPos = new Array[Long](nLanes) // visitPos(lane) = 1-based
    epochLaneOrder(nLanes, epoch, salt).zipWithIndex.foreach {
      case (l, i) => visitPos(l.toInt) = i.toLong + 1L
    }
    val l = lane.cast("long")
    when(l.between(lit(0L), lit(nLanes.toLong - 1L)),
        element_at(lit(visitPos), (l + lit(1L)).cast("int")))
      .otherwise(lit(null).cast("long"))
  }

  def packSequences(df: DataFrame, seqLen: Int, nBuckets: Int,
      eosId: Long, idCol: String = "doc_id", idsCol: String = "bpe_ids",
      salt: String = "graft"): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1: $seqLen")
    require(nBuckets >= 1, s"nBuckets >= 1: $nBuckets")
    require(eosId >= 0, s"eosId must be a vocab id (>= 0): $eosId")
    import org.apache.spark.sql.expressions.Window
    val ow = Window.partitionBy(col("pack_bucket"))
      .orderBy(col("_pk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = withLane(
        df.select(col(idCol), col(idsCol).as("_ids"))
          .where(size(col("_ids")) >= 1),
        nBuckets, idCol, salt)
      .withColumn("_n", size(col("_ids")).cast("long"))
      // running end-of-doc position in the lane's stream (each doc
      // occupies _n ids + 1 EOS); _tot rides the SAME lane window
      // shuffle+sort (unbounded max over the ordered partition), so
      // the trailing-partial filter costs no extra exchange
      .withColumn("_end", sum(col("_n") + lit(1L)).over(ow))
      .withColumn("_tot", max(col("_end")).over(
        Window.partitionBy(col("pack_bucket"))))
      .withColumn("_o", col("_end") - col("_n") - lit(1L))
    packTail(offsets, seqLen, eosId, minSeq = None)
  }

  /** SUFFIX re-pack — the incremental face
    * [[graft.streaming.SequenceShards]] rebuilds touched lanes with:
    * packs ONLY `df`'s rows (each lane's docs from the first doc
    * whose span reaches the first affected sequence), shifted by the
    * lane's `_base` (tokens strictly before that doc in the full
    * stream) and truncated to sequences `>= _min_seq` (everything
    * earlier is bit-stable on disk). `laneCtl` is a tiny
    * (pack_bucket, _base, _tot, _min_seq) control frame — ≤ nBuckets
    * rows, broadcast onto the lane window's output so the pipeline
    * stays the pack exchange + a map-side join. `_tot` is the FULL
    * stream's total (the trailing-partial filter needs the global
    * end, which the suffix alone cannot see). With _base = 0,
    * _min_seq = 0, _tot = the lane total and the full doc set this
    * is exactly [[packSequences]] (spec-pinned). */
  def packSequencesSuffix(df: DataFrame, seqLen: Int, nBuckets: Int,
      eosId: Long, laneCtl: DataFrame, idCol: String = "doc_id",
      idsCol: String = "bpe_ids", salt: String = "graft"): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1: $seqLen")
    require(nBuckets >= 1, s"nBuckets >= 1: $nBuckets")
    require(eosId >= 0, s"eosId must be a vocab id (>= 0): $eosId")
    import org.apache.spark.sql.expressions.Window
    val ow = Window.partitionBy(col("pack_bucket"))
      .orderBy(col("_pk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = withLane(
        df.select(col(idCol), col(idsCol).as("_ids"))
          .where(size(col("_ids")) >= 1),
        nBuckets, idCol, salt)
      .withColumn("_n", size(col("_ids")).cast("long"))
      .withColumn("_end_l", sum(col("_n") + lit(1L)).over(ow))
      .join(broadcast(laneCtl.select(
        col("pack_bucket").cast("long").as("pack_bucket"),
        col("_base").cast("long").as("_base"),
        col("_tot").cast("long").as("_tot"),
        col("_min_seq").cast("long").as("_min_seq"))),
        Seq("pack_bucket"))
      .withColumn("_end", col("_base") + col("_end_l"))
      .withColumn("_o", col("_end") - col("_n") - lit(1L))
    packTail(offsets, seqLen, eosId, minSeq = Some(col("_min_seq")))
  }

  /** The shared pack tail: explode a doc's token span into the
    * sequences it overlaps, slice fragments, reassemble per
    * (lane, seq). Expects (pack_bucket, _ids, _n, _o, _tot);
    * `minSeq` (the suffix face) drops sequences already bit-stable
    * on disk. */
  private def packTail(offsets: DataFrame, seqLen: Int, eosId: Long,
      minSeq: Option[Column]): DataFrame = {
    val L = lit(seqLen.toLong)
    val eos = lit(eosId.toString)
    // positions [_o, _o + _n] are this doc's tokens (_o + _n = EOS);
    // it overlaps sequences _o div L .. (_o + _n) div L — at most
    // n/L + 2 slices per doc, total ∝ corpus tokens
    val segsAll = offsets
      .withColumn("_s", explode(expr(
        s"sequence(_o div ${seqLen}L, (_o + _n) div ${seqLen}L)")))
      .where(col("_s") * L + L <= col("_tot"))
    val segs = minSeq.map(m => segsAll.where(col("_s") >= m))
      .getOrElse(segsAll)
      .withColumn("_lo", greatest(col("_o"), col("_s") * L))
      .withColumn("_hi", least(col("_o") + col("_n"),
        col("_s") * L + L - lit(1L)))
    def sliceCsv(len: Column): Column = array_join(transform(
      slice(col("_ids"), (col("_lo") - col("_o") + lit(1L)).cast("int"),
        len.cast("int")), x => x.cast("string")), ",")
    segs
      .withColumn("_frag",
        when(col("_hi") < col("_o") + col("_n"),
          sliceCsv(col("_hi") - col("_lo") + lit(1L)))
          // _hi == _o + _n: the slice covers _lo .. EOS-1, then EOS
          .when(col("_hi") > col("_lo"),
            concat(sliceCsv(col("_hi") - col("_lo")), lit(","), eos))
          .otherwise(eos)) // EOS alone landed on a sequence boundary
      .groupBy(col("pack_bucket"), col("_s"))
      .agg(count(lit(1)).as("n_docs"),
        // fragments reassemble in stream order: array_sort on the
        // (_lo, _frag) struct orders by _lo (distinct within a
        // sequence); ONE collect buffer (bounded at seqLen ids per
        // group), both output faces derive from it row-locally below
        array_sort(collect_list(struct(col("_lo"), col("_frag"))))
          .as("_frags"))
      .select(col("pack_bucket"), col("_s").cast("long").as("seq_idx"),
        col("n_docs"),
        // the sorted _lo values double as the in-sequence document
        // start offsets (_lo = max(o, s*L), so a carried-over head
        // reads 0)
        array_join(transform(col("_frags"),
          x => (x.getField("_lo") - col("_s") * L).cast("string")),
          ",").as("starts_csv"),
        array_join(transform(col("_frags"),
          x => x.getField("_frag")), ",").as("ids_csv"))
  }

  /** Rebalance a corpus to a TARGET mixture (DoReMi-style domain
    * weighting): keep the largest corpus whose per-stratum composition
    * matches `weights` (integer proportions, e.g. web 7 : code 2 :
    * papers 1), downsampling every over-represented stratum and
    * keeping under-represented ones whole. Strata not listed are
    * dropped. Unlike [[stratified]] (caller-fixed per-stratum rates),
    * the rates here are DERIVED from the actual counts:
    *
    *   T   = min_s floor(count_s · W / w_s)   (feasible total)
    *   k_s = floor(w_s · T / W)               (per-stratum keep target)
    *
    * computed in exact BigInt arithmetic, then applied as the same
    * deterministic hash-cutoff membership as [[sample]] with cutoff
    * floor(k_s · 2^32 / count_s) — a pure function of (salt, id), so
    * the kept set is engine- and partitioning-independent, and an SQL
    * oracle re-derives the identical cutoffs from the data with
    * 128-bit integer division (no float rounding anywhere in the
    * rate computation).
    *
    * 100 TB shape: one map-side-combined groupBy collecting ≤|strata|
    * count rows to the driver (control-plane, like catalog listings);
    * membership is a row-local CASE filter that pushes down to the
    * scan. No shuffle of the corpus, no window, no global sort. */
  def rebalance(docs: DataFrame, strataCol: String,
      weights: Seq[(String, Long)], idCol: String = "doc_id",
      salt: String = "graft"): DataFrame = {
    require(weights.nonEmpty, "empty target mixture")
    require(weights.forall(_._2 > 0), s"weights must be positive: $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate stratum in target mixture: $weights")
    val listed = weights.map(_._1)
    val counts: Map[String, Long] = docs
      .where(col(strataCol).isin(listed: _*))
      .groupBy(col(strataCol).cast("string"))
      .agg(count(lit(1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    weights.foreach { case (s, _) =>
      require(counts.getOrElse(s, 0L) > 0L,
        s"stratum '$s' has no rows — target mixture infeasible")
    }
    val w32 = BigInt(4294967296L)
    val bigW = BigInt(weights.map(_._2).sum)
    val t = weights.map { case (s, w) => BigInt(counts(s)) * bigW / w }.min
    val cutoffs = weights.map { case (s, w) =>
      val ks = BigInt(w) * t / bigW
      val c = BigInt(counts(s))
      // 'g' sorts above every hex digit: the keep-all sentinel
      val cut =
        if (ks >= c) "g" else f"${(ks * w32 / c).toLong}%08x"
      (s, cut)
    }
    val cutCol = cutoffs.foldLeft(lit("0"): Column) {
      case (e, (s, cu)) => when(col(strataCol) === s, lit(cu)).otherwise(e)
    }
    docs.where(col(strataCol).isin(listed: _*))
      .where(hashBucket(col(idCol), salt) < cutCol)
  }

  /** Temperature-based mixture sampling at τ = 2 ("square-root
    * scaling", the multilingual-pretraining standard for upweighting
    * rare languages/sources): downsample each stratum at keep rate
    * sqrt(n_min / n_s), so the rarest stratum keeps every row and
    * post-sample stratum sizes are ∝ sqrt(n_s) — the τ = 2 mixture —
    * without ever upsampling. τ is FIXED at 2 deliberately: sqrt is
    * the one fractional power IEEE 754 defines as correctly rounded,
    * so the per-stratum cutoff floor(sqrt(n_min/n_s)·2³²) is
    * bit-identical on every engine (a general pow(x, 1/τ) is
    * libm-dependent — for other temperatures, precompute rates
    * offline and use [[stratified]]).
    *
    * Stratum counts are G control-plane rows collected once (the
    * [[rebalance]] discipline); membership stays the row-local
    * integer-space hash comparison of [[weighted]] — one pushable
    * filter, no shuffle on the data path. Strata tied at n_min take
    * the 2³² keep-all cutoff (every 32-bit hash is strictly below
    * it); all other rates are < 1 but their product with 2³² is
    * capped at 2³²−1 in case a near-tie's sqrt rounds up to 1.0. */
  def temperatureSample(df: DataFrame, strataCol: String,
      idCol: String = "doc_id", salt: String = "graft"): DataFrame = {
    // NULL strata are excluded from BOTH the counts and the output:
    // letting a null group participate in n_min would silently set
    // the keep-all baseline from rows that then get dropped anyway
    // (the when-chain can never match null), skewing every real
    // stratum's rate — rows without a stratum are not a mixture
    // component, they're unlabeled data the caller must bucket first.
    val counts: Seq[(String, Long)] = df
      .where(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string"))
      .agg(count(lit(1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    require(counts.nonEmpty,
      "temperatureSample: no non-null strata in the corpus")
    val nMin = counts.map(_._2).min
    val cutCol = counts.foldLeft(lit(0L): Column) { case (e, (s, n)) =>
      val cut =
        if (n == nMin) 4294967296L
        else math.min(
          (math.sqrt(nMin.toDouble / n.toDouble) * 4294967296.0).toLong,
          4294967295L)
      when(col(strataCol).cast("string") === s, lit(cut)).otherwise(e)
    }
    val bucket = conv(hashBucket(col(idCol), salt), 16, 10).cast("long")
    df.where(bucket < cutCol)
  }
}
