package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-call corpus curation — the composition a training-data pipeline
  * actually runs, wired from the individually-verified operators:
  *
  *   1. quality gate   ([[TextOps.qualityFeatures]] thresholds)
  *   2. exact dedup    (keep the LOWEST id per content fingerprint —
  *                      the deterministic "canonical copy" rule)
  *   3. mixture shaping ([[Sampling.stratified]] per-stratum rates)
  *
  * Scale shape: stage 1 is shuffle-free column math; stage 2 is ONE
  * hash shuffle on the 16-byte fingerprint (window-min, no join);
  * stage 3 is a row-local filter that composes into stage 2's output
  * without another exchange. Total: one shuffle end to end, nothing
  * driver-side.
  */
object Curate {

  /** Returns the curated corpus: original columns plus the quality
    * features, only canonical (lowest-id) copies, thinned per stratum.
    */
  def curate(docs: DataFrame, minTokens: Long,
      maxStopwordRatioMicro6: Long, strataCol: String,
      rates: Seq[(String, Double)], default: Double = 1.0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val quality = TextOps.qualityFeatures(docs, textCol)
      .where(col("n_tokens") >= minTokens &&
        col("stopword_ratio_micro6") <= maxStopwordRatioMicro6)
    val deduped = quality
      .withColumn("_fp", TextOps.fingerprint(col(textCol)))
      .withColumn("_keep",
        min(col(idCol)).over(Window.partitionBy(col("_fp"))))
      .where(col(idCol) === col("_keep"))
      .drop("_fp", "_keep")
    Sampling.stratified(deduped, strataCol, rates, default, idCol)
  }
}
