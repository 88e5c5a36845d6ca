package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scoring is a codegen-friendly fold over `zip_with` — no UDF in the
  * hot path. Floats are widened to double BEFORE any arithmetic so the
  * accumulation is a deterministic left-to-right IEEE double fold,
  * identical on every engine/partitioning (scores are rounded to 6
  * decimals before ranking for cross-engine rank stability).
  *
  * Norms are precomputed once per row, never per candidate pair — at
  * n rows and p pairs that's O(n·d) instead of O(p·d) norm work, a
  * ~3x saving even at sf0.1 and the difference between feasible and
  * not at 100 TB.
  *
  * Scale shapes:
  *  - bruteForceTopK: broadcast the (tiny) query vector+norm, score
  *    every row, top-k via TakeOrdered (no global sort shuffle). The
  *    right baseline up to ~10^9 rows per query batch.
  *  - ivfTopK: partition-pruned variant — score only rows in the
  *    query's coarse cell (here the `label` column as the quantizer
  *    cell; in production, k-means cell ids computed at ingest and
  *    used as a partition key so Catalyst prunes everything else).
  *  - cosineNearDupPairs: exact within-cell O(n²/cells) self-join.
  */
object Similarity {

  /** dot(a, b): exact left-fold over doubles, via the codegen'd native
    * expression (graft.functions.DotProduct) — same index-order IEEE
    * accumulation as the `aggregate(zip_with(...))` composition, ~4x
    * faster because it stays inside whole-stage codegen. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotF(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  private def withNorm(emb: DataFrame, vecCol: String): DataFrame =
    emb.withColumn("_nrm", norm(col(vecCol)))

  /** Top-k rows by cosine similarity to the vector of `queryId`.
    * Ties broken by id for full determinism. */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = withNorm(emb, vecCol)
    val q = n.where(col(idCol) === queryId)
      .select(col(vecCol).as("_qvec"), col("_nrm").as("_qnrm"))
    n.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(dot(col(vecCol), col("_qvec")) / (col("_nrm") * col("_qnrm")),
          6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc).limit(k)
  }

  /** IVF-shaped top-k: only rows sharing the query row's coarse cell
    * (`cellCol`) are scored. */
  def ivfTopK(emb: DataFrame, queryId: Long, k: Int,
      cellCol: String = "label", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val n = withNorm(emb, vecCol)
    val q = n.where(col(idCol) === queryId)
      .select(col(vecCol).as("_qvec"), col("_nrm").as("_qnrm"),
        col(cellCol).as("_qcell"))
    n.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .where(col(cellCol) === col("_qcell"))
      .select(col(idCol), col(cellCol),
        round(dot(col(vecCol), col("_qvec")) / (col("_nrm") * col("_qnrm")),
          6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc).limit(k)
  }

  /** All near-duplicate pairs by embedding cosine ≥ threshold.
    * Exact O(n²/cells) via coarse-cell pruning; pass cellCol = None
    * for the unconstrained exact variant. */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double,
      cellCol: Option[String], idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val n = withNorm(emb, vecCol)
    val a = n.as("a"); val b = n.as("b")
    val cellEq = cellCol.map(c => col(s"a.$c") === col(s"b.$c"))
      .getOrElse(lit(true))
    a.join(b, col(s"a.$idCol") < col(s"b.$idCol") && cellEq)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        round(dot(col(s"a.$vecCol"), col(s"b.$vecCol"))
          / (col("a._nrm") * col("b._nrm")), 6).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }
}
