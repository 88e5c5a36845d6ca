package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over a document corpus — Okapi BM25 ranking
  * (Robertson & Walker SIGIR'94; the Lucene-style `ln(1 + ...)`
  * positive idf) as a Spark-native batch operator. A training-data
  * pipeline uses this to pull topical subsets out of a web-scale
  * corpus ("all documents about X"), to build retrieval-augmented
  * training examples, and to audit what a corpus contains.
  *
  * Scale shape (the 100 TB story):
  *   - The per-document work (tokenize, explode) happens in the scan
  *     stage at full parallelism, and the query-term filter is applied
  *     BEFORE the first shuffle — only postings for query terms ever
  *     leave a task. For a q-term query the shuffled volume is
  *     O(docs containing a query term), not O(corpus tokens).
  *   - Everything small broadcasts: the per-term document frequencies
  *     (≤ q rows), the corpus length stats (1 row), and the
  *     query-id → term map. The corpus side never re-partitions.
  *   - The final ranking aggregates (doc, query) score rows — already
  *     reduced to candidates — and takes top-k per query with one
  *     window over those candidates (single-query face: TakeOrdered).
  *
  * Cross-engine exactness (the oracle discipline of this repo): each
  * per-(doc, term) BM25 contribution is computed as ONE identical IEEE
  * double expression on bit-identical integer inputs (tf, df, dl, N,
  * Σdl) in both engines, then quantized with `floor(x · 1e6)` to a
  * BIGINT *before* the cross-row sum — floating addition order can
  * never reorder, and rank ties break on doc id. The only libm call is
  * a single `ln` on an identical double.
  */
object Search {

  /** Postings for the given terms only: one row per (doc, term) with
    * the term frequency and the document token length. The building
    * block [[bm25TopKBatch]] runs on; exposed so callers can persist
    * the full inverted index (pass `terms = None`) and serve many
    * queries from it. */
  def postings(docs: DataFrame, terms: Option[Seq[String]],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // tokens projected into a named column FIRST (lambda-CSE rule)
    val toks = docs
      .select(col(idCol).as("doc_id"),
        TextOps.tokens(lower(col(textCol))).as("_toks"))
      .withColumn("dl", size(col("_toks")).cast("long"))
    val exploded =
      toks.select(col("doc_id"), col("dl"), explode(col("_toks")).as("term"))
    val wanted = terms match {
      case Some(ts) => exploded.where(col("term").isin(ts: _*))
      case None => exploded
    }
    wanted.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Corpus-wide doc count and total token length — the BM25 length
    * normalizer. One map-side-combined aggregate to a single row. */
  def corpusLengthStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(size(TextOps.tokens(lower(col(textCol)))).cast("long")
        .as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))

  /** Top-k BM25 retrieval for a batch of queries in ONE pass over the
    * corpus. Returns (query_id, doc_id, score_mu, n_terms): micro-unit
    * integer score (descending), number of query terms matched; ties
    * break to the lower doc id. k1/b are the standard Okapi defaults.
    *
    * A term shared by several queries is scored once per query via the
    * broadcast (query_id, term) map — the corpus-side posting rows are
    * built once for the union of all query terms. */
  def bm25TopKBatch(docs: DataFrame, queries: Seq[(Long, String)],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty, "empty query batch")
    require(k >= 1, s"k must be >= 1: $k")
    val qTerms: Seq[(Long, String)] = queries.flatMap { case (qid, q) =>
      q.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
        .map(t => (qid, t))
    }
    require(qTerms.nonEmpty, "queries tokenize to no terms")
    val spark = docs.sparkSession
    import spark.implicits._
    val qdf = qTerms.toDF("query_id", "term")
    val allTerms = qTerms.map(_._2).distinct

    val tf = postings(docs, Some(allTerms), idCol, textCol)
    // document frequency per term — ≤ |terms| rows, broadcasts
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = corpusLengthStats(docs, idCol, textCol)

    // ONE identical IEEE expression in both engines, floored to µ
    // BEFORE the per-doc sum (cross-row float addition is not
    // order-stable; a BIGINT sum is).
    val termScoreMu = floor(
      log(lit(1.0) +
        (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) *
          (lit(1.0) - lit(b) + lit(b) *
            (col("dl") * col("n") / col("sumdl")))) *
        lit(1000000.0)).cast("long")

    val scored = tf
      .join(broadcast(dfq), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qdf), Seq("term"))
      .withColumn("term_score_mu", termScoreMu)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_score_mu")).as("score_mu"),
        count(lit(1)).as("n_terms"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_mu").desc, col("doc_id").asc)
    scored.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .drop("_rn")
  }

  /** Per-document top-k keywords by smoothed TF-IDF — the standard
    * corpus-metadata tagger (topical labels, routing keys, index
    * summaries for a 100 TB corpus):
    *
    *   tfidf(d, t) = tf(d, t) · ln((N + 1) / (df(t) + 1))
    *
    * floored to BIGINT micro-units; top-k per doc, score-descending,
    * ties to the lexicographically smaller term.
    *
    * Scale shape: term frequencies come from the same one-shuffle
    * postings build as BM25; document frequencies are a vocabulary-
    * sized aggregate of those postings joined back ON THE TERM KEY
    * (vocabulary outgrows broadcast at corpus scale — this stays a
    * shuffle join by design, and AQE absorbs hot-term skew); the
    * final top-k window partitions by document over already-reduced
    * posting rows, never raw tokens. */
  def tfidfTopTerms(docs: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val tf = postings(docs, None, idCol, textCol)
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf_mu", floor(
        col("tf") * log((col("n") + lit(1.0)) / (col("df") + lit(1.0))) *
          lit(1000000.0)).cast("long"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf_mu").desc, col("term").asc)
    scored.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("tfidf_mu"))
  }

  /** Single-query face of [[bm25TopKBatch]]:
    * (doc_id, score_mu, n_terms), best first. */
  def bm25TopK(docs: DataFrame, query: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bm25TopKBatch(docs, Seq((0L, query)), k, k1, b, idCol, textCol)
      .drop("query_id")
      .orderBy(col("score_mu").desc, col("doc_id").asc)

  /** Hybrid lexical + vector retrieval with reciprocal-rank fusion
    * (Cormack, Clarke & Büttcher, SIGIR 2009): fuse the BM25 top-kCand
    * and the cosine top-kCand by rank — rrf(d) = Σ 1/(kRrf + rank_d) —
    * the standard recipe for combining keyword and embedding search
    * without comparing their incomparable score scales. `query` is the
    * lexical face; `queryVecId` names the query's vector in `emb`
    * (the vector side excludes the query vector itself, as
    * [[Similarity.bruteForceTopK]] does).
    *
    * Cross-engine exactness: both input ranks are over already-exact
    * orderings (BIGINT BM25 micro-units; cosine rounded to 6 dp before
    * ranking — each verified by its own oracle), and each RRF term is
    * the pure integer division 1000000 div (kRrf + rank), so the fused
    * score is an exact BIGINT sum of exact BIGINTs.
    *
    * Scale shape: both arms end at kCand candidate rows, so the rank
    * windows and the full-outer fusion join run over ≤ 2·kCand narrow
    * rows (driver-light, broadcast-size) — the heavy work is the two
    * arms, each already shaped for scale. A missing arm contributes 0,
    * so lexical-only and vector-only hits still fuse. */
  def hybridTopK(docs: DataFrame, emb: DataFrame, query: String,
      queryVecId: Long, k: Int, kCand: Int = 50, kRrf: Int = 60,
      idCol: String = "doc_id", textCol: String = "text",
      vecIdCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // the fused pool holds up to 2*kCand docs, so k may exceed kCand
    require(kCand >= 1, s"kCand must be >= 1: $kCand")
    require(kRrf >= 1, s"kRrf must be >= 1: $kRrf")
    val lex = bm25TopK(docs, query, kCand, idCol = idCol,
        textCol = textCol)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("score_mu").desc, col("doc_id").asc))
        .cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    val vec = Similarity.bruteForceTopK(emb, queryVecId, kCand,
        vecIdCol, vecCol)
      .withColumn("vec_rank", row_number().over(
        Window.orderBy(col("cos_sim").desc, col(vecIdCol).asc))
        .cast("long"))
      .select(col(vecIdCol).as("doc_id"), col("vec_rank"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf_mu",
        coalesce(expr(s"1000000L div (${kRrf}L + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000L div (${kRrf}L + vec_rank)"), lit(0L)))
      .orderBy(col("rrf_mu").desc, col("doc_id").asc)
      .limit(k)
  }
}
