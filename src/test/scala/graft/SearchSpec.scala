package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Search

/** BM25 retrieval on crafted micro-fixtures: hand-computed ranking,
  * the batch ≡ single contract, idf ordering, and the scale-shape
  * guards (query-term filter before the first shuffle; broadcast
  * df/stats/query joins). */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // df("spark") = 3, df("flink") = 1; doc 2 repeats "spark"
  private lazy val docs = Seq(
    (0L, "spark runs fast"),
    (1L, "spark and flink stream"),
    (2L, "spark spark spark engine"),
    (3L, "ducks swim in ponds"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("single-term ranking follows tf with length normalization") {
    val r = Search.bm25TopK(docs, "spark", k = 10).collect()
    // only the three docs containing the term appear
    assert(r.map(_.getAs[Long]("doc_id")).toSet == Set(0L, 1L, 2L))
    // doc 2 (tf=3) outranks doc 0 (tf=1, short) outranks doc 1 (tf=1,
    // longer doc → stronger length penalty)
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 0L, 1L))
    assert(r.forall(_.getAs[Long]("n_terms") == 1L))
    assert(r.forall(_.getAs[Long]("score_mu") > 0L))
  }

  test("rarer terms carry higher idf at equal tf") {
    // doc 1 holds both terms once each in the same document (same dl),
    // so the per-term scores differ only through df
    val both = Search.bm25TopKBatch(docs,
      Seq((10L, "spark"), (20L, "flink")), k = 10)
      .where(col("doc_id") === 1L)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("score_mu"))).toMap
    assert(both(20L) > both(10L)) // df 1 beats df 3
  }

  test("multi-term scores sum per matched term and rank the best doc " +
      "first; k truncates deterministically") {
    val r = Search.bm25TopK(docs, "spark flink", k = 2).collect()
    assert(r.length == 2)
    // doc 1 matches both terms (flink's high idf dominates)
    assert(r.head.getAs[Long]("doc_id") == 1L)
    assert(r.head.getAs[Long]("n_terms") == 2L)
  }

  test("batch over one query equals the single-query face") {
    val single = Search.bm25TopK(docs, "spark engine", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = Search.bm25TopKBatch(docs, Seq((7L, "spark engine")), k = 3)
      .drop("query_id").orderBy(col("score_mu").desc, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(single.toSeq == batch.toSeq)
  }

  test("unknown terms match nothing; empty query errors") {
    assert(Search.bm25TopK(docs, "zebra", k = 5).count() == 0L)
    intercept[IllegalArgumentException] {
      Search.bm25TopK(docs, "   ", k = 5)
    }
  }

  test("scale shape: term filter reaches the corpus side before the " +
      "first exchange, and df/stats/query maps broadcast") {
    val plan = Search.bm25TopKBatch(docs,
      Seq((1L, "spark"), (2L, "flink stream")), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "corpus-side postings must never sort-merge against the tiny sides")
    // the isin() term filter sits under the generate/explode, i.e. in
    // the scan stage — look for the literal term set in a Filter above
    // the Generate but below any Exchange boundary marker ordering:
    // cheap structural proxy: the filter string appears in the plan
    assert(plan.contains("spark"))
  }

  test("tfidf keywords rank distinctive terms above ubiquitous ones") {
    val corpus = Seq(
      (0L, "common zebra common"),
      (1L, "common words only"),
      (2L, "common words again")
    ).toDF("doc_id", "text")
    val r = Search.tfidfTopTerms(corpus, k = 2).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    // "common" appears in every doc → idf ln(4/4) = 0 → score 0;
    // "zebra" (df 1) tops doc 0 despite tf 1 vs common's tf 2
    assert(r(0L).head.getAs[String]("term") == "zebra")
    assert(r(0L).head.getAs[Long]("tfidf_mu") > 0L)
    assert(r(0L).find(_.getAs[String]("term") == "common")
      .get.getAs[Long]("tfidf_mu") == 0L)
    // k truncates: 2 keywords per doc max
    assert(r.values.forall(_.length <= 2))
  }

  test("lm scoring: repeated fluent bigrams beat unseen ones; short " +
      "docs score zeros; held-out scoring uses the train LM") {
    import graft.pipeline.TextOps
    val corpus = Seq(
      (0L, "the cat sat"),
      (1L, "the cat sat"),
      (2L, "the cat sat"),
      (3L, "sat zebra the"),  // bigrams never seen elsewhere
      (4L, "x")               // too short: zero bigrams
    ).toDF("doc_id", "text")
    val r = TextOps.lmScore(corpus).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_bigrams"), x.getAs[Long]("logprob_mu"),
          x.getAs[Long]("avg_logprob_mu"))).toMap
    assert(r(4L) == ((0L, 0L, 0L)))
    assert(r(0L) == r(1L) && r(1L) == r(2L))
    // the common sentence is much more probable than the rare one
    assert(r(0L)._3 > r(3L)._3)
    assert(r(3L)._2 < 0L) // log-probs are negative micro-units
    // held-out doc with an unseen bigram start falls back to 1/V mass
    val heldOut = Seq((9L, "unseen words here")).toDF("doc_id", "text")
    val h = TextOps.lmScore(heldOut, train = Some(corpus)).collect()
    assert(h.head.getAs[Long]("n_bigrams") == 2L)
    assert(h.head.getAs[Long]("logprob_mu") < 0L)
  }

  test("postings with terms=None build the full inverted index") {
    val idx = Search.postings(docs, None).collect()
    // 13 distinct (doc, term) pairs across the non-empty docs
    assert(idx.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[String]("term"))).toSet.size == idx.length)
    assert(idx.filter(_.getAs[Long]("doc_id") == 2L)
      .find(_.getAs[String]("term") == "spark")
      .get.getAs[Long]("tf") == 3L)
  }

  test("hybrid RRF fuses lexical and vector arms with exact integers") {
    // vec query 9 = (1.0, 0.05): vector top-2 = doc 0, doc 3;
    // lexical top-2 for "spark" = doc 2 (tf 3), doc 0 (short)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f)),
      (2L, Array(-1.0f, 0.0f)),
      (9L, Array(1.0f, 0.05f))
    ).toDF("vec_id", "embedding")
    val r = Search.hybridTopK(docs, emb, "spark", queryVecId = 9L,
      k = 10, kCand = 2).collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(0L, 2L, 3L))
    val byId = r.map(x => x.getAs[Long]("doc_id") ->
      x.getAs[Long]("rrf_mu")).toMap
    // doc 0 is in BOTH arms: 1e6 div (60+2) + 1e6 div (60+1)
    assert(byId(0L) == 1000000L / 62 + 1000000L / 61)
    assert(byId(2L) == 1000000L / 61) // lexical rank 1 only
    assert(byId(3L) == 1000000L / 62) // vector rank 2 only
    // the query's own vector never surfaces
    assert(!byId.contains(9L))
    // single-arm rows carry a null rank on the missing side
    assert(r.find(_.getAs[Long]("doc_id") == 2L).get.isNullAt(
      r.head.fieldIndex("vec_rank")))
  }

  // --- persisted index lifecycle -----------------------------------------

  private def tmpIdx(): String =
    java.nio.file.Files.createTempDirectory("bm25idx").toString + "/idx"

  private def serve(dir: String, qs: Seq[(Long, String)], k: Int) =
    Search.bm25TopKBatchFromIndex(spark, dir, qs, k)
      .collect().map(_.toString).sorted.toSeq

  private def inline(qs: Seq[(Long, String)], k: Int) =
    Search.bm25TopKBatch(docs, qs, k)
      .collect().map(_.toString).sorted.toSeq

  private val queries = Seq((1L, "spark flink"), (2L, "ducks engine"))

  test("stored-index serve equals inline BM25 at every k") {
    val dir = tmpIdx()
    Search.writeBm25Index(docs, dir, nBuckets = 4)
    (1 to 6).foreach { k =>
      assert(serve(dir, queries, k) == inline(queries, k), s"k=$k")
    }
    // single-query face too
    val one = Search.bm25TopKFromIndex(spark, dir, "spark flink", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val oneInline = Search.bm25TopK(docs, "spark flink", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(one.toSeq == oneInline.toSeq)
  }

  test("append extends the index: build(evens) + append(odds) serves " +
      "exactly like inline over the whole corpus, before and after " +
      "compaction; a replayed duplicate append heals at serve AND at " +
      "compact") {
    val dir = tmpIdx()
    val evens = docs.where(col("doc_id") % 2 === 0)
    val odds = docs.where(col("doc_id") % 2 === 1)
    Search.writeBm25Index(evens, dir, nBuckets = 4)
    Search.appendToBm25Index(odds, dir)
    val want = inline(queries, 5)
    assert(serve(dir, queries, 5) == want, "append-extended serve")
    // a replayed append: identical postings rows + an identical stats
    // partial — the serve's dropDuplicates + stats distinct() heal it
    Search.appendToBm25Index(odds, dir)
    assert(serve(dir, queries, 5) == want, "replayed append at serve")
    // compaction heals the stored layout too (any-copy dedup + stats
    // fold to one row) and answers are unchanged
    Search.compactBm25Index(spark, dir)
    assert(serve(dir, queries, 5) == want, "post-compact serve")
    assert(spark.read.parquet(s"$dir/stats").count() == 1L,
      "stats partials fold to one exact row")
    val posts = spark.read.parquet(s"$dir/postings")
    assert(posts.count() ==
      posts.dropDuplicates("term", "doc_id").count(),
      "compaction removed the replayed duplicates")
    // idempotent on a clean index; loud on a typo'd dir
    Search.compactBm25Index(spark, dir)
    assert(serve(dir, queries, 5) == want)
    val e = intercept[IllegalArgumentException] {
      Search.compactBm25Index(spark, s"$dir/definitely-missing")
    }
    assert(e.getMessage.contains("no postings tree"))
  }

  test("append face guards the mid-swap state: a crashed compact's " +
      "parked postings/stats restore at the append's entry (never an " +
      "empty recreated tree), an orphan tmp fails loudly, and a " +
      "typo'd dir never creates trees") {
    val dir = tmpIdx()
    val evens = docs.where(col("doc_id") % 2 === 0)
    val odds = docs.where(col("doc_id") % 2 === 1)
    Search.writeBm25Index(evens, dir, nBuckets = 4)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
    // crashed compact mid-flip: postings parked in trash, live
    // absent — an unguarded append would recreate an empty postings
    // tree holding only this batch (df/idf silently wrong) and the
    // next compact's cleanSiblings would delete the parked history
    assert(fs.rename(p("postings"), p(".postings-trash")))
    Search.appendToBm25Index(odds, dir)
    assert(fs.exists(p("postings")) && !fs.exists(p(".postings-trash")),
      "append entry must restore the parked postings")
    assert(serve(dir, queries, 5) == inline(queries, 5),
      "healed + appended index must serve the full corpus")
    // the stats sidecar carries the same guard (the replayed odds
    // append below is healed by serve-side dedup, per contract)
    assert(fs.rename(p("stats"), p(".stats-trash")))
    Search.appendToBm25Index(odds, dir)
    assert(fs.exists(p("stats")) && !fs.exists(p(".stats-trash")),
      "append entry must restore the parked stats")
    assert(serve(dir, queries, 5) == inline(queries, 5))
    // orphan tmp (no live, no trash) is external interference: loud
    assert(fs.rename(p("postings"), p(".postings-compact")))
    intercept[java.io.IOException] {
      Search.appendToBm25Index(odds, dir)
    }
    assert(fs.rename(p(".postings-compact"), p("postings")))
    // a truly absent layout fails loudly instead of creating trees
    val e = intercept[IllegalArgumentException] {
      Search.appendToBm25Index(odds, s"$dir-definitely-missing")
    }
    assert(e.getMessage.contains("no postings tree"))
  }

  test("postings folds are file-size-aware: compact emits " +
      "~ceil(bucketBytes/target) files per bucket (bounded write " +
      "tasks, never one task per bucket), the fresh build sizes from " +
      "corpus bytes, and answers are unchanged") {
    import org.apache.hadoop.fs.Path
    val base = tmpIdx()
    val corpusDir = s"$base-corpus"
    docs.write.parquet(corpusDir)
    val stored = spark.read.parquet(corpusDir)
    val dir = s"$base/bm25"
    // fresh build: parquet-backed input + a toy target makes the
    // estimated per-bucket split engage (corpus bytes >> target)
    Search.writeBm25Index(stored, dir, nBuckets = 4,
      targetBytesPerFile = 64L)
    def bucketFiles(): Map[Int, Int] = {
      val root = new java.io.File(s"$dir/postings")
      root.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(d => d.getName.stripPrefix("bucket=").toInt ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    val fresh = bucketFiles()
    assert(fresh.values.max >= 2,
      s"fresh build never split a bucket: $fresh")
    val want = serve(dir, queries, 5)
    assert(want == inline(queries, 5))
    // compact: EXACT per-bucket sizing from the live dirs' bytes —
    // every bucket's file count stays within its sizedFileCount cap
    // and at least one bucket genuinely splits at this target
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val preBytes = fs.listStatus(new Path(s"$dir/postings"))
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("bucket="))
      .map(s => s.getPath.getName.stripPrefix("bucket=").toInt ->
        graft.util.Maint.parquetBytes(fs, Seq(s.getPath))).toMap
    Search.compactBm25Index(spark, dir, targetBytesPerFile = 512L)
    val post = bucketFiles()
    post.foreach { case (b, n) =>
      val cap = graft.util.Maint.sizedFileCount(preBytes(b), 512L)
      assert(n >= 1 && n <= cap,
        s"bucket $b: $n files vs sized cap $cap")
    }
    assert(post.values.max >= 2, s"compact never split a bucket: $post")
    assert(serve(dir, queries, 5) == want, "post-compact answers")
  }

  test("hybrid from indexes equals inline hybridTopK at every k and " +
      "never scans corpus text or raw embeddings") {
    // inline face: emb INCLUDES the query row (9) and excludes it
    // from candidates; index face: the index is built WITHOUT row 9
    // and queried with its vector at nprobe = kCells (exhaustive over
    // the index) — the configurations are semantically identical
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f)),
      (2L, Array(-1.0f, 0.0f)),
      (9L, Array(1.0f, 0.05f))
    ).toDF("vec_id", "embedding")
    val bm25 = tmpIdx()
    val ivf = tmpIdx()
    graft.pipeline.Search.writeBm25Index(docs, bm25, nBuckets = 4)
    graft.pipeline.Similarity.writeIvfIndex(
      emb.where(col("vec_id") =!= 9L), ivf, kCells = 2, iters = 2)
    (1 to 4).foreach { k =>
      val fromIdx = Search.hybridTopKFromIndex(spark, bm25, ivf,
          "spark", Seq(1.0f, 0.05f), k, kCand = 2, nprobe = 2)
        .collect().map(_.toString).toSeq
      val inline = Search.hybridTopK(docs, emb, "spark",
          queryVecId = 9L, k, kCand = 2)
        .select("doc_id", "rrf_mu")
        .collect().map(_.toString).toSeq
      // the from-index face carries (doc_id, rrf_mu) + rank columns;
      // compare the fused ranking and scores
      val fromIdx2 = Search.hybridTopKFromIndex(spark, bm25, ivf,
          "spark", Seq(1.0f, 0.05f), k, kCand = 2, nprobe = 2)
        .select("doc_id", "rrf_mu")
        .collect().map(_.toString).toSeq
      assert(fromIdx2 == inline, s"k=$k: $fromIdx2 vs $inline")
      assert(fromIdx.nonEmpty)
    }
    // plan gate: only the two indexes' trees are scanned
    val plan = Search.hybridTopKFromIndex(spark, bm25, ivf, "spark",
        Seq(1.0f, 0.05f), 3, kCand = 2, nprobe = 2)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scans.nonEmpty, plan)
    assert(scans.forall(l => l.contains("/postings")
      || l.contains("/stats") || l.contains("/vectors")), plan)
  }

  test("stored-index serve never reads corpus text: the only " +
      "FileScans are the index's own trees, with the bucket partition " +
      "pruned and the term predicate pushed") {
    val dir = tmpIdx()
    Search.writeBm25Index(docs, dir, nBuckets = 4)
    val plan = Search.bm25TopKBatchFromIndex(spark, dir, queries, 3)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scans.nonEmpty, plan)
    assert(scans.forall(l => l.contains("/postings")
      || l.contains("/stats")), plan)
    // the bucket prune reaches the partition filters and the term-IN
    // predicate is pushed into the postings scan
    val postScan = scans.filter(_.contains("/postings"))
    assert(postScan.exists(_.contains("PartitionFilters: [bucket")
      ), plan)
    assert(postScan.exists(_.contains("term")), plan)
  }

  test("scale shape: the serve plan scans the postings tree ONCE and " +
      "its dedup + df window share one term-keyed exchange (the df " +
      "groupBy+broadcast self-join re-executed the whole tf lineage — " +
      "column pruning defeats AQE exchange reuse)") {
    val dir = tmpIdx()
    Search.writeBm25Index(docs, dir, nBuckets = 4)
    // pre-run executedPlan prints the single initial tree (no AQE
    // twins yet) — the exchange-count gate rule
    val plan = Search.bm25TopKBatchFromIndex(spark, dir, queries, 3)
      .queryExecution.executedPlan.toString
    val postScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/postings"))
      .size
    assert(postScans == 1, s"postings scanned $postScans times:\n$plan")
    // exactly one term-keyed exchange feeds dedup + the df window
    val termEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning(term")).size
    assert(termEx == 1, s"term exchanges = $termEx:\n$plan")
  }

  test("compactBm25Buckets folds ONLY over-threshold buckets — " +
      "untouched bucket dirs keep their exact files — and serving " +
      "equals inline before and after, duplicates healed") {
    import org.apache.hadoop.fs.Path
    val dir = tmpIdx()
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    Search.writeBm25Index(docs.where(col("doc_id") < 2), dir,
      nBuckets = 4)
    val append = docs.where(col("doc_id") >= 2)
    Search.appendToBm25Index(append, dir)
    Search.appendToBm25Index(append, dir) // replayed duplicate
    def files(): Map[String, Set[String]] =
      fs.listStatus(new Path(s"$dir/postings")).toSeq
        .filter(d => d.isDirectory &&
          d.getPath.getName.startsWith("bucket="))
        .map(d => d.getPath.getName -> fs.listStatus(d.getPath).toSeq
          .map(_.getPath.getName)
          .filter(n => n.endsWith(".parquet")).toSet).toMap
    val before = files()
    // threshold 2: only buckets the appends actually touched (3
    // files: build + 2 appends) fold; build-only buckets (1 file)
    // keep their exact files
    val folded = Search.compactBm25Buckets(spark, dir,
      maxPartFiles = 2)
    val after = files()
    val foldedNames = folded.map(b => s"bucket=$b").toSet
    assert(folded.nonEmpty, "nothing folded — fixture too small")
    before.keys.foreach { b =>
      if (foldedNames(b)) {
        assert(after(b) != before(b), s"$b not rewritten")
        assert(after(b).size < before(b).size, s"$b not folded")
      } else
        assert(after(b) == before(b), s"untouched $b changed files")
    }
    // duplicates are GONE from the folded buckets' stored rows (an
    // append-only bucket below threshold legitimately keeps its
    // replay duplicates until IT crosses — serve heals them)
    val foldedRows = spark.read.parquet(s"$dir/postings")
      .where(col("bucket").isin(folded.map(b => b: Any): _*))
    assert(foldedRows.count() ==
      foldedRows.dropDuplicates("term", "doc_id").count())
    // serve ≡ inline at every k (the replay healed at the fold)
    (1 to 6).foreach { k =>
      assert(serve(dir, queries, k) == inline(queries, k), s"k=$k")
    }
    // second fold is a no-op: nothing above threshold anymore
    assert(Search.compactBm25Buckets(spark, dir,
      maxPartFiles = 2).isEmpty)
    assert(files() == after)
  }

  test("driver-side bucketOfTerm equals the engine's " +
      "pmod(xxhash64(term), n) for fuzzed terms and every stored " +
      "bucket count") {
    val terms = Seq("spark", "flink", "", "a", "Zz9", "tök",
      "élève", "😀mix", "word word", "tab\tsep",
      "0", "-1", "xxhash", "the") ++
      (0 until 200).map(i => s"t$i${"x" * (i % 7)}")
    for (n <- Seq(1, 4, 64, 997)) {
      val engine = terms.toDF("term")
        .select(col("term"),
          pmod(xxhash64(col("term")), lit(n.toLong)).as("b"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      terms.foreach { t =>
        assert(graft.pipeline.Search.bucketOfTerm(t, n) == engine(t),
          s"term '$t' nBuckets $n")
      }
    }
  }
}
