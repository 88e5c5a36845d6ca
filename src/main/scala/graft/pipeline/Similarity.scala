package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scoring is a codegen-friendly fold over `zip_with` — no UDF in the
  * hot path. Floats are widened to double BEFORE any arithmetic so the
  * accumulation is a deterministic left-to-right IEEE double fold,
  * identical on every engine/partitioning (scores are rounded to 6
  * decimals before ranking for cross-engine rank stability).
  *
  * Scale shapes:
  *  - bruteForceTopK: broadcast the (tiny) query vectors, score every
  *    row, per-query top-k via TakeOrdered (no global sort shuffle).
  *    The right baseline up to ~10^9 rows per query batch.
  *  - ivfTopK: partition-pruned variant — score only rows in the
  *    query's coarse cell (here: the `label` column as the quantizer
  *    cell; in production, k-means cell ids computed at ingest). This
  *    is the IVF shape: at 100 TB the cell column is a partition key
  *    and Catalyst prunes everything else.
  */
object Similarity {

  /** dot(a, b) as an exact left-fold over doubles */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Top-k rows by cosine similarity to the vector of `queryId`.
    * Ties broken by id for full determinism. */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.where(col(idCol) === queryId)
      .select(col(vecCol).as("_qvec"))
    val scored = emb.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        cosine(col(vecCol), col("_qvec")).as("cos_sim"))
    scored.orderBy(col("cos_sim").desc, col(idCol).asc).limit(k)
  }

  /** IVF-shaped top-k: only rows sharing the query row's coarse cell
    * (`cellCol`) are scored. */
  def ivfTopK(emb: DataFrame, queryId: Long, k: Int,
      cellCol: String = "label", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = emb.where(col(idCol) === queryId)
      .select(col(vecCol).as("_qvec"), col(cellCol).as("_qcell"))
    val scored = emb.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .where(col(cellCol) === col("_qcell"))
      .select(col(idCol), col(cellCol),
        cosine(col(vecCol), col("_qvec")).as("cos_sim"))
    scored.orderBy(col("cos_sim").desc, col(idCol).asc).limit(k)
  }

  /** All near-duplicate pairs by embedding cosine ≥ threshold.
    * Exact O(n²/cells) via the same coarse-cell pruning: near-dup
    * vectors land in the same cell for any reasonable quantizer. For
    * the unconstrained exact variant pass cellCol = None. */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double,
      cellCol: Option[String], idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val a = emb.as("a"); val b = emb.as("b")
    val cellEq = cellCol.map(c => col(s"a.$c") === col(s"b.$c"))
      .getOrElse(lit(true))
    a.join(b, col(s"a.$idCol") < col(s"b.$idCol") && cellEq)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        cosine(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }
}
