package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.CorpusDedup

/** Long-history probe for the streaming corpus-dedup faces: drive a
  * many-micro-batch run (the specs cover few-batch histories) and
  * measure per-batch wall clock vs batch index, with and without the
  * periodic sidecar compactions — the flat-per-batch-cost claim is a
  * plan-shape argument until this measures it.
  *
  * Usage:
  *   runMain graft.StreamMaintProbe <face> [docsParquet] [nBatches] [compactEvery]
  * face ∈ exact | neardup | semantic | all; compactEvery = 0 disables
  * maintenance (the baseline curve). Prints one line per batch
  * (face, mode, batch index, seconds, live version-partition count)
  * and a per-decile mean summary per (face, mode).
  *
  * Probe tool only — the library never calls this; outputs land under
  * /tmp/graft_maint_probe.
  */
object StreamMaintProbe {
  def main(args: Array[String]): Unit = {
    val face = args.headOption.getOrElse("all")
    val docsPath =
      if (args.length > 1) args(1) else "/tmp/sf1/documents.parquet"
    val nBatches = if (args.length > 2) args(2).toInt else 60
    val compactEvery = if (args.length > 3) args(3).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = s"/tmp/graft_maint_probe_${System.nanoTime()}"

    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
    }
    def versionCount(dir: String): Int = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0
      else fs.listStatus(p)
        .count(s => s.isDirectory && s.getPath.getName.startsWith("version="))
    }

    // Pre-split the doc ids into batches ONCE (driver-side ranges, the
    // docs table is read per batch by id range — mirrors a stream
    // source handing each trigger its slice).
    val docs = spark.read.parquet(docsPath)
      .select(col("doc_id"), col("text"))
    val ids = docs.select(min("doc_id"), max("doc_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val span = (hi - lo + 1 + nBatches - 1) / nBatches
    def batchDf(i: Int): DataFrame =
      docs.where(col("doc_id") >= lo + i * span &&
        col("doc_id") < lo + (i + 1) * span)

    // Deterministic synthetic vectors for the semantic face: family =
    // id mod nFams sets the angle, variant perturbs a tail component —
    // the spec's famVec at probe scale, derived per row in the plan.
    def vecBatch(i: Int): DataFrame =
      batchDf(i).select(col("doc_id").as("vec_id"),
        array(
          cos(col("doc_id") % 97 * lit(0.06)).cast("float"),
          sin(col("doc_id") % 97 * lit(0.06)).cast("float"),
          (col("doc_id") % 11).cast("float") * lit(0.0001f),
          lit(0f)).as("embedding"))

    def runFace(name: String, modes: Seq[Int])(
        append: (DataFrame, Long, String) => Long)(
        compact: String => Unit): Unit =
      modes.foreach { every =>
        val mode = if (every > 0) s"compact$every" else "nocompact"
        val dir = s"$base/$name-$mode"
        val times = (0 until nBatches).map { i =>
          val b = if (name == "semantic") vecBatch(i) else batchDf(i)
          val t0 = System.nanoTime()
          append(b, i + 1L, dir)
          val dt = (System.nanoTime() - t0) / 1e9
          sweep()
          if (every > 0 && (i + 1) % every == 0) compact(dir)
          sweep()
          println(f"[probe] $name $mode batch=${i + 1}%d sec=$dt%.2f " +
            f"versions=${versionCount(s"$dir-side")}%d")
          dt
        }
        val dec = math.max(1, nBatches / 10)
        val means = times.grouped(dec).map(g => g.sum / g.size).toSeq
        println(s"[probe] $name $mode decile_means=" +
          means.map(m => f"$m%.2f").mkString(","))
      }

    val modes = if (compactEvery > 0) Seq(0, compactEvery) else Seq(0)
    if (face == "exact" || face == "all")
      runFace("exact", modes) { (b, v, dir) =>
        CorpusDedup.appendBatch(spark, b, v, s"$dir-corpus",
          s"$dir-side", s"$dir-fp")
      } { dir =>
        CorpusDedup.compactTier(spark, s"$dir-side")
        CorpusDedup.compactFp(spark, s"$dir-fp")
      }
    if (face == "neardup" || face == "all")
      runFace("neardup", modes) { (b, v, dir) =>
        CorpusDedup.appendBatchNearDup(spark, b, v, s"$dir-corpus",
          s"$dir-side", k = 3, threshold = 0.5, maxDf = 200)
      } { dir => CorpusDedup.compactPostings(spark, s"$dir-side") }
    if (face == "semantic" || face == "all") {
      val cents = graft.pipeline.Similarity.trainIvfCentroids(
        vecBatch(0).limit(2000), k = 8, iters = 5)
      runFace("semantic", modes) { (b, v, dir) =>
        CorpusDedup.appendBatchSemantic(spark, b, v, s"$dir-corpus",
          s"$dir-side", cents, threshold = 0.9999)
      } { dir => CorpusDedup.compactVectors(spark, s"$dir-side") }
    }
    spark.stop()
  }
}
