package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The measurement self-defense shared by Bench and the scale probes
  * (E2eProbe, StreamMaintProbe): fixed machine canaries, the load
  * probe, and the min-of-three tie-break. Bench numbers on this class
  * of host drift 1.3-1.5x with host state on byte-identical code —
  * the r17/r18 phantom-regression lesson — so every probe that prints
  * a wall-clock number must carry its own contamination evidence
  * (canaries + per-leg spread), or a cross-round reader cannot tell
  * host drift from a code regression. One copy here; Bench delegates.
  */
object ProbeGuard {

  /** CPU canary: a FIXED, in-memory, CPU-bound workload (xxhash64
    * fold over a 256M-row range) — no file IO, no shuffle payload, no
    * data dependence. min-of-2 absorbs a JIT/GC blip; sustained
    * contention shows in both samples. */
  def canaryCpu(spark: SparkSession, partitions: Int): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 256000000L, 1L, partitions)
        .select(xxhash64(col("id")).as("h"))
        .agg(max(col("h"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  /** IO/scheduler canary: fixed parquet scan + one shuffle + agg —
    * the subsystems the CPU canary cannot certify (r13-vs-r14: +17%
    * on byte-identical code at a LOWER cpu canary, drift concentrated
    * in the shuffle-heavy family). */
  def canaryIo(spark: SparkSession, parquetPath: String,
      keyCol: String, partitions: Int): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(parquetPath)
        .repartition(partitions, col(keyCol))
        .groupBy(col(keyCol))
        .agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  /** 1-minute load average — the machine-contention tell. */
  def loadavg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split(" ")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** Bench's min-of-three tie-break for one probe leg: two timed
    * runs, a third ONLY when they disagree past `bound`. Returns
    * (min seconds, final spread = max/min over the runs kept) — a
    * spread still past the bound marks the leg host-contaminated
    * (rerun it before reading a cross-round diff as a regression). */
  def minOfThree(run: () => Double, bound: Double = 1.3)
      : (Double, Double) = {
    // a non-positive sample is a degenerate/failed run, not a fast
    // one: an unguarded max/min would print Infinity/NaN spread (and
    // trigger a pointless third run) — floor the denominator so the
    // spread stays finite and the cross-round reader sees a huge
    // (contaminated) ratio instead of a poisoned field
    def spread(vs: Seq[Double]): Double =
      vs.max / math.max(vs.min, 1e-9)
    val a = run()
    val b = run()
    val two = Seq(a, b)
    val vs =
      if (spread(two) > bound) two :+ run()
      else two
    (vs.min, spread(vs))
  }
}
