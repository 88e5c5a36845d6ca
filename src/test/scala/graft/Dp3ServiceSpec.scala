package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.api.Dp3Service
import graft.model.EventsCatalog

/** The facade mirroring the reference's endpoint set — one smoke per
  * verb over the sf0.001 events table. */
class Dp3ServiceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val cat = new EventsCatalog(dir)
  private lazy val svc = new Dp3Service(cat, s => cat.messages(s))

  test("query endpoint") {
    assert(svc.query(spark, "from p3 click limit 5;").count() == 5)
  }

  test("explain query returns plan rows") {
    val df = svc.query(spark, "explain from p3 click;")
    assert(df.columns.toSeq == Seq("plan"))
  }

  test("skeleton query strips payload, keeps envelope and row sequence") {
    val full = svc.query(spark, "from p3 click limit 5;")
    val sk = svc.query(spark, "from p3 click limit 5;", skeleton = true)
    // payload columns gone, envelope intact
    assert(sk.columns.toSet == Set("producer", "topic", "time",
      "time_us", "seq"))
    assert(!sk.columns.exists(Set("value", "props", "k")))
    // identical row sequence to the full query's envelope
    val want = full.select("topic", "time", "seq").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = sk.select("topic", "time", "seq").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want && got.length == 5)
  }

  test("skeleton empties a binary data column in place") {
    import spark.implicits._
    val df = Seq(
      ("pX", "scan", 1L, 1L, Array[Byte](1, 2, 3)),
      ("pX", "scan", 2L, 2L, Array[Byte](4, 5)))
      .toDF("producer", "topic", "time", "seq", "data")
    val s2 = new Dp3Service(new graft.model.DataFrameCatalog(df),
      _ => df)
    val sk = s2.query(spark, "from pX scan;", skeleton = true)
    assert(sk.columns.contains("data"))
    val rows = sk.collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Array[Byte]]("data").isEmpty))
  }

  test("ndjson serialization") {
    val rows = svc.queryNdjson(spark, "from p3 click limit 2;",
      Seq("value", "k")).collect()
    assert(rows.length == 2 && rows.head.startsWith("{\"topic\":"))
  }

  test("statrange honors granularity and errors below base") {
    val bins = svc.statRange(spark, 3600L * 1000000000L)
    assert(bins.count() > 0)
    // served width is the base tier (60 s ≤ 1 h < 3840 s)
    val w = bins.select((col("end_ns") - col("start_ns")).as("w"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(w == Set(60L * 1000000000L))
    assertThrows[IllegalArgumentException](
      svc.statRange(spark, 1000000000L))
  }

  test("statrange returns partially-overlapping boundary bins") {
    // a range straddling a bin boundary by half a bin on each side
    // must include BOTH boundary bins (reference overlap semantics)
    val full = svc.statRange(spark, 3600L * 1000000000L)
      .orderBy("start_ns").limit(2)
      .select("start_ns", "end_ns").collect()
    val (s0, e0) = (full(0).getLong(0), full(0).getLong(1))
    val e1 = full(1).getLong(1)
    val mid = svc.statRange(spark, 3600L * 1000000000L,
      startNs = (s0 + e0) / 2, endNs = e1 - 1)
    val starts = mid.select("start_ns").collect()
      .map(_.getLong(0)).toSet
    assert(starts.contains(s0), s"boundary bin $s0 missing: $starts")
  }

  test("statistics supports topic/time restriction") {
    val day = 86400L * 1000000000L
    val one = svc.statistics(spark, day, groupByProducer = false,
      topics = Seq("click"))
    assert(one.select("topic").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("click"))
  }

  test("truncation is visible to subsequent queries") {
    val fresh = new Dp3Service(cat, s => cat.messages(s))
    assert(fresh.query(spark, "from p5 error;").count() > 0)
    fresh.truncate(spark, "truncate p5 error now;")
    assert(fresh.query(spark, "from p5 error;").count() == 0)
    // other producers unaffected
    assert(fresh.query(spark, "from p6 error;").count() > 0)
  }

  test("statistics merges producers") {
    val merged = svc.statistics(spark, 86400L * 1000000000L,
      groupByProducer = false)
    assert(!merged.columns.contains("producer"))
    assert(merged.count() > 0)
  }

  test("available lists stats") {
    assert(svc.statisticsAvailable(spark, Seq("value"), Seq("props"))
      .count() > 0)
  }

  test("export merges topics in time order") {
    val e = svc.export(spark, Seq("click", "error")).limit(100)
      .select("time").collect().map(_.getLong(0))
    assert(e.sameElements(e.sorted))
  }

  test("store-backed truncation hides whole ingest versions from " +
      "data and stats") {
    import spark.implicits._
    import graft.stats.StatTiers
    val base = java.nio.file.Files.createTempDirectory("graft-trunc")
      .toString
    val v1 = Seq(("p0", "click", 10L * 1000000000L, 1L, 1.0),
      ("p0", "click", 20L * 1000000000L, 2L, 2.0))
      .toDF("producer", "topic", "time", "seq", "value")
    val v2 = Seq(("p0", "click", 70L * 1000000000L, 3L, 4.0))
      .toDF("producer", "topic", "time", "seq", "value")
    def ver(df: org.apache.spark.sql.DataFrame, v: Long) =
      df.withColumn("ingest_version", lit(v))
    ver(v1, 1).union(ver(v2, 2)).write.parquet(s"$base/data")
    StatTiers.base(v1, StatTiers.BaseWidthNs)
      .withColumn("ingest_version", lit(1L))
      .unionByName(StatTiers.base(v2, StatTiers.BaseWidthNs)
        .withColumn("ingest_version", lit(2L)))
      .write.parquet(s"$base/stats")
    Seq(("p0", "click", 1L, 1000L), ("p0", "click", 2L, 2000L))
      .toDF("producer", "topic", "ingest_version", "ingest_time_ns")
      .write.parquet(s"$base/control")

    val cat = new graft.model.IngestedCatalog(
      s"$base/data", s"$base/stats", s"$base/control")
    val svc = new Dp3Service(cat, s => cat.messages(s),
      Some(graft.api.IngestStore(cat)))

    // timestamp 1500 resolves to ingest version 1 via the control
    // table (reference: sqlrootmap.go:372-404) — batch 1 disappears
    // from queries AND statistics, batch 2 survives
    svc.truncate(spark, "truncate p0 click 1500;")
    assert(svc.query(spark, "from p0 click;").count() == 1)
    val bins = svc.statRange(spark, 3600L * 1000000000L)
    assert(bins.agg(sum("msg_count")).head().getLong(0) == 1L)
    // `now` empties the table entirely
    svc.truncate(spark, "truncate p0 click now;")
    assert(svc.query(spark, "from p0 click;").count() == 0)
    assert(svc.statRange(spark, 3600L * 1000000000L).count() == 0)
  }

  test("statfilter-pruned scans compose as merge children with the " +
      "stream order intact") {
    import spark.implicits._
    import graft.stats.StatTiers
    val base = java.nio.file.Files.createTempDirectory("graft-statm")
      .toString
    val rows = Seq(
      ("p0", "click", 10L * 1000000000L, 1L, 1.0),
      ("p0", "view", 15L * 1000000000L, 2L, 9.0),
      ("p0", "click", 70L * 1000000000L, 3L, 4.0),
      ("p0", "view", 75L * 1000000000L, 4L, 9.0))
      .toDF("producer", "topic", "time", "seq", "value")
      .withColumn("ingest_version", lit(1L))
    rows.write.parquet(s"$base/data")
    StatTiers.base(rows, StatTiers.BaseWidthNs)
      .withColumn("ingest_version", lit(1L))
      .write.parquet(s"$base/stats")
    Seq(("p0", "click", 1L, 1000L), ("p0", "view", 1L, 1000L))
      .toDF("producer", "topic", "ingest_version", "ingest_time_ns")
      .write.parquet(s"$base/control")
    val cat = new graft.model.IngestedCatalog(
      s"$base/data", s"$base/stats", s"$base/control")
    val stored = new Dp3Service(cat, s => cat.messages(s),
      Some(graft.api.IngestStore(cat)))
    val bare = new Dp3Service(cat, s => cat.messages(s))
    // where binds to click only: the click scan prunes to its one
    // qualifying bucket; the view scan is untouched; the merged stream
    // keeps global time order
    val ql = "from p0 click, view where click.value > 3;"
    val got = stored.query(spark, ql)
      .select("topic", "time").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == bare.query(spark, ql)
      .select("topic", "time").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(got == Seq(("view", 15L * 1000000000L),
      ("click", 70L * 1000000000L), ("view", 75L * 1000000000L)))
    assert(stored.query(spark, ql).queryExecution.executedPlan
      .toString.contains("LeftSemi"))
  }

  test("store-backed statfilter prunes QL scans to qualifying buckets") {
    import spark.implicits._
    import graft.stats.StatTiers
    val base = java.nio.file.Files.createTempDirectory("graft-statf")
      .toString
    // bucket 0 (<=2.0) and bucket 1 (4.0): a value > 3 query must skip
    // bucket 0 via the stored min/max and still return bucket 1's row
    val v1 = Seq(("p0", "click", 10L * 1000000000L, 1L, 1.0),
      ("p0", "click", 20L * 1000000000L, 2L, 2.0))
      .toDF("producer", "topic", "time", "seq", "value")
    val v2 = Seq(("p0", "click", 70L * 1000000000L, 3L, 4.0))
      .toDF("producer", "topic", "time", "seq", "value")
    def ver(df: org.apache.spark.sql.DataFrame, v: Long) =
      df.withColumn("ingest_version", lit(v))
    ver(v1, 1).union(ver(v2, 2)).write.parquet(s"$base/data")
    StatTiers.base(v1, StatTiers.BaseWidthNs)
      .withColumn("ingest_version", lit(1L))
      .unionByName(StatTiers.base(v2, StatTiers.BaseWidthNs)
        .withColumn("ingest_version", lit(2L)))
      .write.parquet(s"$base/stats")
    Seq(("p0", "click", 1L, 1000L), ("p0", "click", 2L, 2000L))
      .toDF("producer", "topic", "ingest_version", "ingest_time_ns")
      .write.parquet(s"$base/control")

    val cat = new graft.model.IngestedCatalog(
      s"$base/data", s"$base/stats", s"$base/control")
    val stored = new Dp3Service(cat, s => cat.messages(s),
      Some(graft.api.IngestStore(cat)))
    val bare = new Dp3Service(cat, s => cat.messages(s))

    val ql = "from p0 click where click.value > 3;"
    val pruned = stored.query(spark, ql)
    // results identical to the unpruned service — the statfilter only
    // proves absences (reference: statfilter skips chunks, the row
    // filter still runs, server/tree/iterator.go:173-199)
    assert(pruned.select("time", "seq").collect().toSeq
      == bare.query(spark, ql).select("time", "seq").collect().toSeq)
    assert(pruned.count() == 1)
    // and the plan really carries the bucket skip: the broadcast
    // semi-join against qualifying stat rows
    assert(pruned.queryExecution.executedPlan.toString
      .contains("LeftSemi"))
    // a query no stored stats can check is planned without the skip
    val untouched = stored.query(spark,
      "from p0 click where click.value != 3;")
    assert(!untouched.queryExecution.executedPlan.toString
      .contains("LeftSemi"))
    assert(untouched.count() == 3)
  }

  test("statfilter pruning turns off when the tier does not cover " +
      "every ingest version") {
    import spark.implicits._
    import graft.stats.StatTiers
    val base = java.nio.file.Files.createTempDirectory("graft-statc")
      .toString
    // version 2 wrote data but NO stat partials (stats enabled late, or
    // an import that skipped them): its bucket is absent from the tier,
    // and pruning against an under-covering tier would drop v2's rows
    // as "provably empty" — a false negative the reference never
    // produces (missing stats keep the chunk). The coverage witness
    // must detect the gap and keep the scan unpruned.
    val v1 = Seq(("p0", "click", 10L * 1000000000L, 1L, 1.0),
      ("p0", "click", 20L * 1000000000L, 2L, 2.0))
      .toDF("producer", "topic", "time", "seq", "value")
    val v2 = Seq(("p0", "click", 70L * 1000000000L, 3L, 4.0))
      .toDF("producer", "topic", "time", "seq", "value")
    def ver(df: org.apache.spark.sql.DataFrame, v: Long) =
      df.withColumn("ingest_version", lit(v))
    ver(v1, 1).union(ver(v2, 2)).write.parquet(s"$base/data")
    StatTiers.base(v1, StatTiers.BaseWidthNs)
      .withColumn("ingest_version", lit(1L))
      .write.parquet(s"$base/stats") // v2's partials missing on purpose
    Seq(("p0", "click", 1L, 1000L), ("p0", "click", 2L, 2000L))
      .toDF("producer", "topic", "ingest_version", "ingest_time_ns")
      .write.parquet(s"$base/control")

    val cat = new graft.model.IngestedCatalog(
      s"$base/data", s"$base/stats", s"$base/control")
    val stored = new Dp3Service(cat, s => cat.messages(s),
      Some(graft.api.IngestStore(cat)))

    // the only matching row (value 4.0) lives in the uncovered version:
    // it must surface, and the plan must NOT carry the bucket semi-join
    val got = stored.query(spark, "from p0 click where click.value > 3;")
    assert(got.count() == 1)
    assert(!got.queryExecution.executedPlan.toString.contains("LeftSemi"))

    // truncating the uncovered version restores coverage (masks apply
    // to control and stats alike) — pruning re-engages on a fresh
    // service and stays exact
    val after = new Dp3Service(cat, s => cat.messages(s),
      Some(graft.api.IngestStore(cat)))
    after.truncate(spark, "truncate p0 click now;")
    assert(after.query(spark, "from p0 click where click.value > 3;")
      .count() == 0)
  }

  test("statrange plan is all-codegen and the store path matches the " +
      "raw path, quantiles included") {
    import spark.implicits._
    import graft.stats.StatTiers
    val base = java.nio.file.Files.createTempDirectory("graft-statq")
      .toString
    val rows = Seq(
      ("p0", "click", 10L * 1000000000L, 1L, 1.0),
      ("p0", "click", 20L * 1000000000L, 2L, 2.0),
      ("p0", "click", 30L * 1000000000L, 3L, Double.NaN),
      ("p0", "click", 70L * 1000000000L, 4L, 4.0),
      ("p0", "view", 15L * 1000000000L, 5L, -3.0))
      .toDF("producer", "topic", "time", "seq", "value")
      .withColumn("ingest_version", lit(1L))
    rows.write.parquet(s"$base/data")
    StatTiers.base(rows, StatTiers.BaseWidthNs)
      .withColumn("ingest_version", lit(1L))
      .write.parquet(s"$base/stats")
    Seq(("p0", "click", 1L, 1000L), ("p0", "view", 1L, 1000L))
      .toDF("producer", "topic", "ingest_version", "ingest_time_ns")
      .write.parquet(s"$base/control")
    val cat2 = new graft.model.IngestedCatalog(
      s"$base/data", s"$base/stats", s"$base/control")
    val stored = new Dp3Service(cat2, s => cat2.messages(s),
      Some(graft.api.IngestStore(cat2)))
    val raw = new Dp3Service(cat2, s => cat2.messages(s))
    val gran = 3600L * 1000000000L
    val a = stored.statRange(spark, gran)
    val b = raw.statRange(spark, gran)
    // round-13 gate: the serving surface never runs the typed
    // aggregator (ObjectHashAggregate + kryo) or an interpreted
    // quantile UDF — both branches are codegen shapes
    for (df <- Seq(a, b, stored.statistics(spark, gran,
        groupByProducer = false))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("ObjectHashAggregate"), p)
      assert(!p.contains("ScalaUDF"), p)
    }
    // store-served records (rolled from map-face partials) are
    // identical to raw aggregation, quantile for quantile (NaN-safe
    // via boxed-Double Row equality; the NaN sample counts toward
    // msg_count but never wins a quantile)
    val got = a.orderBy("producer", "topic", "start_ns").collect().toSeq
    val want = b.orderBy("producer", "topic", "start_ns").collect().toSeq
    assert(got == want, s"store path diverged:\n$got\nvs\n$want")
    assert(got.nonEmpty)
    // and the quantiles agree with the map-face reference walk
    val mRow = StatTiers.base(rows.where(col("topic") === "click"
        && col("time") < 60L * 1000000000L), StatTiers.BaseWidthNs)
      .head()
    val m = Map(mRow.getMap[Int, Long](mRow.fieldIndex("sketch"))
      .toSeq: _*)
    val clickBin0 = got.find(r => r.getString(1) == "click"
      && r.getLong(2) == 0L).get
    val want50 = graft.stats.DDSketch.quantile(m, 0.5)
    val got50 = clickBin0.getDouble(clickBin0.fieldIndex("p50"))
    assert(math.abs(got50 - want50) <= 2 * math.ulp(want50),
      s"p50 $got50 vs $want50")
    assert(got.forall(r => !r.isNullAt(r.fieldIndex("p50"))))
  }

  test("statrange serves per-field records") {
    val bins = svc.statRangeFields(spark, 3600L * 1000000000L,
      numericFields = Seq("value", "k"), textFields = Seq("props"),
      topic = Some("click"))
    val fields = bins.select("field", "field_type").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fields == Set(("value", "numeric"), ("k", "numeric"),
      ("props", "text")))
    // numeric rows carry stats + sketch quantiles, text rows min/max
    val v = bins.where(col("field") === "value").limit(1).head()
    assert(!v.isNullAt(v.fieldIndex("num_mean"))
      && !v.isNullAt(v.fieldIndex("p50")))
    val p = bins.where(col("field") === "props").limit(1).head()
    assert(!p.isNullAt(p.fieldIndex("text_min"))
      && p.isNullAt(p.fieldIndex("num_count")))
  }

  test("statrange per-field serves TEXT-ONLY field sets with null " +
      "quantiles (round-13 regression: the quantile join must not " +
      "demand numeric fields)") {
    val bins = svc.statRangeFields(spark, 3600L * 1000000000L,
      numericFields = Nil, textFields = Seq("props"),
      topic = Some("click"))
    val rows = bins.limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("field_type") == "text")
      assert(!r.isNullAt(r.fieldIndex("text_min")))
      assert(r.isNullAt(r.fieldIndex("p50"))
        && r.isNullAt(r.fieldIndex("p95")))
    }
  }

  test("catalog listings: topics, producers, tables") {
    val ts = svc.topics(spark).collect().map(_.getString(0)).toSeq
    assert(ts.contains("click") && ts.contains("error"))
    assert(ts == ts.sorted)
    val ps = svc.producersList(spark).collect().map(_.getString(0))
    assert(ps.contains("p3") && ps.length >= 10)
    val tbl = svc.tables(spark, producer = Some("p3"),
      topic = Some("click")).collect()
    assert(tbl.length == 1)
    assert(tbl.head.getAs[Long]("msg_count") > 0)
    assert(tbl.head.getAs[Long]("max_time")
      >= tbl.head.getAs[Long]("min_time"))
  }

  test("delete verb masks a time range from queries and stats") {
    val fresh = new Dp3Service(cat, s => cat.messages(s))
    val all = fresh.query(spark, "from p3 click;")
    val n0 = all.count()
    val bounds = all.agg(org.apache.spark.sql.functions.min("time"),
      org.apache.spark.sql.functions.max("time")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val mid = lo + (hi - lo) / 2
    fresh.delete("p3", "click", lo, mid)
    val n1 = fresh.query(spark, "from p3 click;").count()
    assert(n1 < n0 && n1 > 0)
    // deleted range is gone from the data actually returned
    val minLeft = fresh.query(spark, "from p3 click;")
      .agg(org.apache.spark.sql.functions.min("time")).head().getLong(0)
    assert(minLeft >= mid)
    // other producers untouched
    assert(fresh.query(spark, "from p5 click;").count() > 0)
    // reference-style validation
    assertThrows[IllegalArgumentException](
      fresh.delete("", "click", 0L, 1L))
    assertThrows[IllegalArgumentException](
      fresh.delete("p3", "click", 5L, 5L))
  }

  test("truncate statement masks data") {
    val before = cat.messages(spark)
      .where(col("producer") === "p3" && col("topic") === "click").count()
    val after = svc.truncate(spark, "truncate p3 click now;")
      .where(col("producer") === "p3" && col("topic") === "click").count()
    assert(before > 0 && after == 0)
  }
}
