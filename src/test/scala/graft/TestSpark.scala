package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** One shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // plan-shape gates read PushedFilters/ReadSchema from the plan
      // string; default 100-char metadata truncation hides the tail
      .config("spark.sql.maxMetadataStringLength", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** The reference's all-primitives fixture (reference:
    * server/executor/executor_test.go:327-388 prepTmgr2): topics t0..t9,
    * 5 messages each, every numeric field = message index c,
    * log_time = c + i*c, s = "hello". */
  def prepFixture(): DataFrame = {
    val rows = for {
      i <- 0 until 10
      c <- 0 until 5
    } yield {
      val t = (c + i * c).toLong
      (s"t$i", "device", t, t, c.toLong * 1000 + i, // seq unique
        c.toShort, c, c.toLong, c.toLong,
        c.toByte, c.toShort, c, c.toLong,
        c.toFloat, c.toDouble, "hello")
    }
    val s = spark
    import s.implicits._
    rows.toDF("topic", "producer", "time", "time_us", "seq",
      "u8", "u16", "u32", "u64", "i8", "i16", "i32", "i64",
      "f32", "f64", "s")
  }
}
