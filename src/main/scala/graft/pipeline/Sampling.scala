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
}
