package graft

import java.nio.file.{Files, Path => JPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity
import graft.streaming.{CorpusDedup, Ingest}
import graft.util.Maint

/** The maintenance-protocol crash matrix: for EVERY filesystem step of
  * [[graft.util.Maint]] (as exercised by each verb), inject a crash at
  * that step, then assert heal-or-loud — re-running the verb restores
  * a state whose ANSWERS equal the never-crashed run's. One spec
  * instead of a hand-written test per (verb × window) because the
  * steps live in one audited helper: the matrix ENUMERATES ITSELF by
  * first recording which steps a clean run fires, then replaying the
  * verb once per step with a throwing hook.
  *
  * Answer-level comparison is deliberate: the duplicates-harmless
  * protocol ([[Maint.renamePartsInto]]) tolerates crash windows that
  * leave redundant rows (membership semi-joins and `distinct()` flag
  * plans collapse them), so raw-row equality would be WRONG to assert
  * there — each scenario supplies the verb's downstream answer face
  * (distinct membership rows, bit_or-merged bloom words, exact rows
  * for the flip-protocol verbs whose duplicates would change
  * answers). */
class MaintProtocolSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private final case class CrashInjected(verb: String, point: String)
    extends RuntimeException(s"injected crash: $verb@$point")

  /** One verb under test: build pristine state under a base dir, run
    * the verb against it, read the verb's downstream answer. All three
    * take the scenario's base directory. */
  private final case class Scenario(
      verb: String,
      setup: String => Unit,
      run: String => Unit,
      answer: String => Seq[String])

  private def copyTree(src: JPath, dst: JPath): Unit = {
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    }
  }

  private def freshCopy(pristine: JPath): String = {
    val d = Files.createTempDirectory("maintcrash")
    Files.delete(d)
    copyTree(pristine, d)
    d.toString
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Run the full matrix for one scenario: clean run for the expected
    * answer, a recording run to enumerate the steps this verb fires,
    * then one crash injection per step followed by a healing re-run
    * whose answer must equal the clean run's. */
  private def crashMatrix(sc: Scenario): Unit = {
    val pristine = Files.createTempDirectory(s"maintpristine-${sc.verb}")
    sc.setup(pristine.toString)
    val clean = freshCopy(pristine)
    sc.run(clean)
    val expected = sc.answer(clean)
    assert(expected.nonEmpty, s"${sc.verb}: empty expected answer — " +
      "the scenario exercises nothing")
    // enumerate the steps a clean run fires (first occurrence each)
    val points = scala.collection.mutable.LinkedHashSet[String]()
    Maint.crashHook = (v, p) => if (v == sc.verb) { points += p; () }
    try sc.run(freshCopy(pristine))
    finally Maint.crashHook = (_, _) => ()
    assert(points.nonEmpty,
      s"${sc.verb} fired no Maint steps — not routed through the helper")
    for (point <- points) {
      val dir = freshCopy(pristine)
      Maint.crashHook = (v, p) =>
        if (v == sc.verb && p == point) throw CrashInjected(v, p)
      try {
        intercept[CrashInjected] { sc.run(dir) }
      } finally Maint.crashHook = (_, _) => ()
      // heal: re-running the verb must succeed and restore answers
      sc.run(dir)
      assert(sc.answer(dir) == expected,
        s"${sc.verb}: answers diverged after crash at '$point' + re-run")
    }
  }

  /** The heal-path crash matrix: start every injection run from the
    * MID-SWAP state (`park` renames the live tree into its trash
    * sibling — exactly what a crash between a flip's two renames
    * leaves), so the recorded points include the heal-* steps and a
    * crash DURING the heal itself must also recover on re-run. The
    * heal logic is the shared helper, so two representative flip
    * verbs cover it for all. */
  private def healCrashMatrix(sc: Scenario,
      park: String => Unit): Unit = {
    val pristine = Files.createTempDirectory(s"mainthealp-${sc.verb}")
    sc.setup(pristine.toString)
    val clean = freshCopy(pristine)
    park(clean)
    sc.run(clean) // heals, then completes
    val expected = sc.answer(clean)
    assert(expected.nonEmpty, s"${sc.verb}: empty heal-path answer")
    val points = scala.collection.mutable.LinkedHashSet[String]()
    Maint.crashHook = (v, p) => if (v == sc.verb) { points += p; () }
    try { val d = freshCopy(pristine); park(d); sc.run(d) }
    finally Maint.crashHook = (_, _) => ()
    assert(points.exists(_.startsWith("heal")),
      s"${sc.verb}: the parked state fired no heal steps — $points")
    for (point <- points) {
      val dir = freshCopy(pristine)
      park(dir)
      Maint.crashHook = (v, p) =>
        if (v == sc.verb && p == point) throw CrashInjected(v, p)
      try intercept[CrashInjected] { sc.run(dir) }
      finally Maint.crashHook = (_, _) => ()
      sc.run(dir)
      assert(sc.answer(dir) == expected,
        s"${sc.verb}: heal-path crash at '$point' did not recover")
    }
  }

  private def parkDir(base: String, live: String, trash: String)
      : Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new Path(s"$base/$live"), new Path(s"$base/$trash")))
  }

  // ---- exact-dedup sidecars (appendBatch history) -----------------------

  private def exactSetup(base: String): Unit =
    (0 until 4).foreach { i =>
      val b = Seq((i * 10L, s"doc number $i alpha beta gamma"),
        (i * 10L + 1, s"doc number $i delta epsilon zeta"))
        .toDF("doc_id", "text")
      CorpusDedup.appendBatch(spark, b, i + 1L, s"$base/corpus",
        s"$base/tier", s"$base/fp", nBuckets = 16, nWords = 2)
    }

  /** membership face: the bit_or-merged words per bucket over the
    * committed versions — exactly what the next batch's prefilter
    * reads (redundant partials are invariant under bit_or). */
  private def tierAnswer(base: String): Seq[String] = {
    val t = spark.read.parquet(s"$base/tier")
    val maxV = t.agg(max(col("version").cast("long"))).head.getLong(0)
    sortedRows(t.where(col("version") < maxV)
      .groupBy(col("bloom_bucket"))
      .agg(expr("bit_or(bloom_w0)").as("w0"),
        expr("bit_or(bloom_w1)").as("w1")))
  }

  /** membership face: distinct fingerprints per committed version
    * bucketing collapsed — what the exact-confirm semi-join answers. */
  private def fpAnswer(base: String): Seq[String] =
    sortedRows(spark.read.parquet(s"$base/fp")
      .select("doc_id", "_fp").distinct())

  test("compactTier: crash at every step heals on re-run") {
    crashMatrix(Scenario("compactTier", exactSetup,
      b => CorpusDedup.compactTier(spark, s"$b/tier", nWords = 2),
      tierAnswer))
  }

  test("compactFp: crash at every step heals on re-run") {
    crashMatrix(Scenario("compactFp", exactSetup,
      b => CorpusDedup.compactFp(spark, s"$b/fp"),
      fpAnswer))
  }

  // ---- near-dup postings sidecar (flip protocol) ------------------------

  test("compactPostings: crash at every step heals on re-run") {
    def setup(base: String): Unit =
      (0 until 4).foreach { i =>
        val b = Seq((i * 10L,
          s"family $i words one two three four five six seven"))
          .toDF("doc_id", "text")
        CorpusDedup.appendBatchNearDup(spark, b, i + 1L,
          s"$base/corpus", s"$base/postings", k = 3, threshold = 0.5)
      }
    // flip protocol: duplicates would CHANGE answers, so the answer
    // face is the exact posting multiset (and the version layout)
    def answer(base: String): Seq[String] =
      sortedRows(spark.read.parquet(s"$base/postings"))
    crashMatrix(Scenario("compactPostings", setup,
      b => CorpusDedup.compactPostings(spark, s"$b/postings"), answer))
  }

  // ---- semantic vector sidecar ------------------------------------------

  private def vecOf(seed: Int): Seq[Float] =
    (0 until 4).map(d => math.sin(seed * (0.7 + 0.13 * d) + d).toFloat)

  private lazy val semCents: Seq[Seq[Double]] =
    Similarity.trainIvfCentroids(
      (0 until 8).map(i => (i.toLong, vecOf(i))).toDF("vec_id",
        "embedding"), k = 2, iters = 2)

  private def semanticSetup(base: String): Unit =
    (0 until 4).foreach { i =>
      val b = Seq((i * 10L, vecOf(i)), (i * 10L + 1, vecOf(i + 100)))
        .toDF("vec_id", "embedding")
      CorpusDedup.appendBatchSemantic(spark, b, i + 1L,
        s"$base/corpus", s"$base/vec", semCents, threshold = 0.9999)
    }

  /** membership face: distinct sidecar rows (the flag plan ends in
    * distinct(), so redundant crash-window copies are invisible). */
  private def vecAnswer(base: String): Seq[String] =
    sortedRows(spark.read.parquet(s"$base/vec")
      .select("_rv", "_rnrm", "cell").distinct())

  test("compactVectors: crash at every step heals on re-run") {
    crashMatrix(Scenario("compactVectors", semanticSetup,
      b => CorpusDedup.compactVectors(spark, s"$b/vec"), vecAnswer))
  }

  test("requantizeVectors: crash at every step heals on re-run") {
    val cents2 = Similarity.trainIvfCentroids(
      (0 until 8).map(i => (i.toLong, vecOf(i + 3))).toDF("vec_id",
        "embedding"), k = 3, iters = 2)
    crashMatrix(Scenario("requantizeVectors", semanticSetup,
      b => CorpusDedup.requantizeVectors(spark, s"$b/vec", cents2),
      vecAnswer))
  }

  test("heal path itself: crashes DURING a heal-in-progress (the " +
      "mid-swap starting state) recover on re-run, for both a " +
      "version-fold flip and a whole-sidecar flip") {
    healCrashMatrix(
      Scenario("compactPostings",
        base => {
          (0 until 4).foreach { i =>
            CorpusDedup.appendBatchNearDup(spark,
              Seq((i * 10L,
                s"family $i words one two three four five six"))
                .toDF("doc_id", "text"),
              i + 1L, s"$base/corpus", s"$base/postings",
              k = 3, threshold = 0.5)
          }
        },
        b => CorpusDedup.compactPostings(spark, s"$b/postings"),
        b => sortedRows(spark.read.parquet(s"$b/postings"))),
      parkDir(_, "postings", "postings.compact-trash"))
    val cents2 = Similarity.trainIvfCentroids(
      (0 until 8).map(i => (i.toLong, vecOf(i + 3))).toDF("vec_id",
        "embedding"), k = 3, iters = 2)
    healCrashMatrix(
      Scenario("requantizeVectors", semanticSetup,
        b => CorpusDedup.requantizeVectors(spark, s"$b/vec", cents2),
        vecAnswer),
      parkDir(_, "vec", "vec.trash"))
  }

  // ---- persisted vector indexes -----------------------------------------

  private lazy val emb8: DataFrame = {
    val df = (0 until 8)
      .map(i => (i.toLong, vecOf(i), (i % 2).toLong))
      .toDF("vec_id", "embedding", "label")
    df.cache().count()
    df
  }

  private def ivfSetup(base: String): Unit =
    Similarity.writeIvfIndex(emb8, s"$base/ivf", kCells = 2, iters = 2)

  private def ivfAnswer(base: String): Seq[String] =
    sortedRows(spark.read.parquet(s"$base/ivf/vectors")
      .dropDuplicates("vec_id", "cell")) ++
      sortedRows(spark.read.parquet(s"$base/ivf/centroids"))

  test("compactIvfVectors: crash at every step heals on re-run") {
    crashMatrix(Scenario("compactIvfVectors", ivfSetup,
      b => Similarity.compactIvfVectors(spark, s"$b/ivf"), ivfAnswer))
  }

  test("retrainIvfIndex: crash at every step heals on re-run") {
    crashMatrix(Scenario("retrainIvfIndex", ivfSetup,
      b => Similarity.retrainIvfIndex(spark, s"$b/ivf", kCells = 3,
        iters = 2), ivfAnswer))
  }

  private def pqSetup(base: String): Unit =
    Similarity.writePqIndex(emb8, s"$base/pq", dims = 4, m = 2)

  private def pqAnswer(base: String): Seq[String] =
    sortedRows(spark.read.parquet(s"$base/pq/codes")
      .dropDuplicates("_vid", "_sub")) ++
      sortedRows(spark.read.parquet(s"$base/pq/codebook"))

  test("compactPqCodes: crash at every step heals on re-run") {
    crashMatrix(Scenario("compactPqCodes", pqSetup,
      b => Similarity.compactPqCodes(spark, s"$b/pq"), pqAnswer))
  }

  test("retrainPqIndex: crash at every step heals on re-run") {
    crashMatrix(Scenario("retrainPqIndex", pqSetup,
      b => Similarity.retrainPqIndex(emb8, s"$b/pq"), pqAnswer))
  }

  private def ivfPqSetup(base: String): Unit =
    Similarity.writeIvfPqIndex(emb8, s"$base/ivfpq", kCells = 2,
      dims = 4, m = 2, iters = 2)

  private def ivfPqAnswer(base: String): Seq[String] =
    sortedRows(spark.read.parquet(s"$base/ivfpq/codes")
      .dropDuplicates("cell", "_vid", "_sub")) ++
      sortedRows(spark.read.parquet(s"$base/ivfpq/codebook")) ++
      sortedRows(spark.read.parquet(s"$base/ivfpq/centroids"))

  test("compactIvfPqCodes: crash at every step heals on re-run") {
    crashMatrix(Scenario("compactIvfPqCodes", ivfPqSetup,
      b => Similarity.compactIvfPqCodes(spark, s"$b/ivfpq"),
      ivfPqAnswer))
  }

  test("retrainIvfPqIndex: crash at every step heals on re-run") {
    crashMatrix(Scenario("retrainIvfPqIndex", ivfPqSetup,
      b => Similarity.retrainIvfPqIndex(emb8, s"$b/ivfpq", kCells = 2,
        iters = 2), ivfPqAnswer))
  }

  // ---- persisted BM25 index ---------------------------------------------

  private def bm25Setup(base: String): Unit = {
    val docs = Seq((0L, "spark runs fast"), (1L, "spark and flink"),
      (2L, "ducks swim in ponds"), (3L, "spark flink stream"))
      .toDF("doc_id", "text")
    graft.pipeline.Search.writeBm25Index(
      docs.where(col("doc_id") < 2), s"$base/bm25", nBuckets = 4)
    graft.pipeline.Search.appendToBm25Index(
      docs.where(col("doc_id") >= 2), s"$base/bm25")
  }

  /** answer face: the served ranking itself (exact rows after the
    * serve's own duplicate heal) plus the folded stats totals. */
  private def bm25Answer(base: String): Seq[String] =
    sortedRows(graft.pipeline.Search.bm25TopKBatchFromIndex(spark,
      s"$base/bm25", Seq((1L, "spark flink"), (2L, "ducks")), k = 5)) ++
      sortedRows(spark.read.parquet(s"$base/bm25/stats").distinct()
        .agg(sum(col("n")).as("n"), sum(col("sumdl")).as("sumdl")))

  test("compactBm25Index (postings flip): crash at every step heals " +
      "on re-run") {
    crashMatrix(Scenario("compactBm25Postings", bm25Setup,
      b => graft.pipeline.Search.compactBm25Index(spark, s"$b/bm25"),
      bm25Answer))
  }

  test("compactBm25Index (stats fold): crash at every step heals " +
      "on re-run") {
    crashMatrix(Scenario("compactBm25Stats", bm25Setup,
      b => graft.pipeline.Search.compactBm25Index(spark, s"$b/bm25"),
      bm25Answer))
  }

  test("compactBm25Buckets (incremental per-bucket fold): crash at " +
      "every step heals on re-run — including mid bucket-swap, where " +
      "the append AND serve faces restore the parked bucket first") {
    // maxPartFiles = 1 so the build+append state (2 files/bucket)
    // folds; a crash between park and promote leaves a bucket absent,
    // which every face must heal before touching the tree
    crashMatrix(Scenario("compactBm25Buckets", bm25Setup,
      b => graft.pipeline.Search.compactBm25Buckets(spark, s"$b/bm25",
        maxPartFiles = 1),
      bm25Answer))
  }

  test("compactBm25Buckets heal path: a parked bucket (mid-swap crash " +
      "state) restores at the verb's entry, with crashes DURING the " +
      "heal also recovering") {
    healCrashMatrix(
      Scenario("compactBm25Buckets", bm25Setup,
        b => graft.pipeline.Search.compactBm25Buckets(spark, s"$b/bm25",
          maxPartFiles = 1),
        bm25Answer),
      park = { b =>
        // simulate the crash window inside one bucket's swap: the
        // live dir renamed into the trash sibling, promote not done
        import org.apache.hadoop.fs.Path
        val fs = new Path(b).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val live = new Path(s"$b/bm25/postings")
        val parked = fs.listStatus(live)
          .filter(d => d.isDirectory &&
            d.getPath.getName.startsWith("bucket=")).head.getPath
        val trash = new Path(s"$b/bm25/.postings-bswap")
        fs.mkdirs(trash)
        assert(fs.rename(parked, new Path(trash, parked.getName)))
      })
  }

  test("a crashed compactBm25Buckets swap can never serve fewer " +
      "postings or lose the parked bucket to a later append: both " +
      "faces heal it at entry") {
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files
      .createTempDirectory("bswap-faces").toString
    bm25Setup(base)
    val expected = bm25Answer(base)
    def park(): Unit = {
      val fs = new Path(base).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val live = new Path(s"$base/bm25/postings")
      val parked = fs.listStatus(live)
        .filter(d => d.isDirectory &&
          d.getPath.getName.startsWith("bucket=")).head.getPath
      val trash = new Path(s"$base/bm25/.postings-bswap")
      fs.mkdirs(trash)
      assert(fs.rename(parked, new Path(trash, parked.getName)))
    }
    // serve face: heals, answer identical to the pre-crash state
    park()
    assert(bm25Answer(base) == expected)
    // append face: heals BEFORE writing, so the parked history
    // survives — the final state must equal a clean (never-crashed)
    // twin that took the same build + appends
    park()
    graft.pipeline.Search.appendToBm25Index(
      Seq((9L, "spark spark spark")).toDF("doc_id", "text"),
      s"$base/bm25")
    val served = bm25Answer(base)
    val twin = java.nio.file.Files
      .createTempDirectory("bswap-twin").toString
    bm25Setup(twin)
    graft.pipeline.Search.appendToBm25Index(
      Seq((9L, "spark spark spark")).toDF("doc_id", "text"),
      s"$twin/bm25")
    assert(served == bm25Answer(twin), served.mkString("\n"))
  }

  // ---- incremental sequence shards (docs overwrite + lane swap) ---------

  test("sequenceShards appendBatch: crash at every step heals on " +
      "replaying the batch (the stream's own recovery path)") {
    def mk(ids: Seq[Long]) = ids.map(i => (i,
      Array.tabulate((i % 5).toInt + 1)(j => (i + j).toInt)))
      .toDF("doc_id", "bpe_ids")
    def setup(base: String): Unit =
      Seq(0L until 12L, 12L until 24L).zipWithIndex.foreach {
        case (ids, i) =>
          graft.streaming.SequenceShards.appendBatch(spark, mk(ids),
            i + 1L, s"$base/sq", seqLen = 6, nBuckets = 3, eosId = 0L)
      }
    def answer(base: String): Seq[String] =
      sortedRows(graft.streaming.SequenceShards.read(spark, s"$base/sq")
        .select(col("pack_bucket").cast("long"), col("seq_idx"),
          col("n_docs"), col("starts").cast("array<int>"),
          col("ids").cast("array<int>")))
    crashMatrix(Scenario("sequenceShards", setup,
      b => { graft.streaming.SequenceShards.appendBatch(spark,
        mk(24L until 36L), 3L, s"$b/sq", seqLen = 6, nBuckets = 3,
        eosId = 0L); () },
      answer))
  }

  test("sequenceShards compactDocs (docs sidecar flip): crash at " +
      "every step heals on re-run") {
    def mk(ids: Seq[Long]) = ids.map(i => (i,
      Array.tabulate((i % 5).toInt + 1)(j => (i + j).toInt)))
      .toDF("doc_id", "bpe_ids")
    def setup(base: String): Unit =
      Seq(0L until 12L, 12L until 24L, 24L until 36L).zipWithIndex
        .foreach { case (ids, i) =>
          graft.streaming.SequenceShards.appendBatch(spark, mk(ids),
            i + 1L, s"$base/sq", seqLen = 6, nBuckets = 3, eosId = 0L)
        }
    // the answer carries BOTH faces a duplicate/lost doc row would
    // corrupt: the docs sidecar's content (offset inputs) and the
    // derived shard rows
    def answer(base: String): Seq[String] =
      sortedRows(spark.read.parquet(s"$base/sq/docs")
        .select(col("doc_id"), col("lane").cast("long"),
          col("pk"), col("n"))) ++
      sortedRows(graft.streaming.SequenceShards.read(spark, s"$base/sq")
        .select(col("pack_bucket").cast("long"), col("seq_idx"),
          col("n_docs"), col("starts").cast("array<int>"),
          col("ids").cast("array<int>")))
    crashMatrix(Scenario("compactDocs", setup,
      b => graft.streaming.SequenceShards.compactDocs(spark,
        s"$b/sq"),
      answer))
  }

  // ---- ingest store maintenance (partition park/swap + sidecar flip) ----

  private def storeSetup(base: String): Unit =
    (1 to 3).foreach { v =>
      val batch = (0 until 6).map { i =>
        ("t0", "p", (v * 100 + i).toLong * 1000000000L,
          (v * 1000 + i).toLong, i.toDouble)
      }.toDF("topic", "producer", "time", "seq", "value")
        .withColumn("day", expr("time div 86400000000000"))
      Ingest.appendVersion(batch, v.toLong, s"$base/data",
        s"$base/stats", None, None)
    }

  private def storeAnswer(base: String): Seq[String] =
    sortedRows(spark.read.parquet(s"$base/data")
      .select("topic", "producer", "time", "seq", "value",
        "ingest_version")) ++
      sortedRows(spark.read.parquet(s"$base/stats"))

  test("scrubVersion: crash at every step heals on re-run") {
    crashMatrix(Scenario("scrubVersion", storeSetup,
      b => Ingest.scrubVersion(spark, 2L, s"$b/data", s"$b/stats",
        None, None),
      storeAnswer))
  }

  test("optimize: crash at every step heals on re-run") {
    crashMatrix(Scenario("optimize", storeSetup,
      b => { Ingest.optimize(spark, s"$b/data",
        maxFilesPerPartition = 1); () },
      storeAnswer))
  }
}
