package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.TopicMapCatalog
import graft.plan.Planner

/** Heterogeneous per-topic schemas — dp3 tables are not guaranteed
  * schema-consistent (reference: server/executor/expression.go:17-34);
  * merged streams must union by name with null fill, and filters
  * compile against each scan's own schema.
  */
class HeteroSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val catalog = {
    import spark.implicits._
    // /imu has angular_velocity, /fix has latitude — disjoint payloads
    val imu = Seq(("dev", "/imu", 10L, 1L, 0.5),
      ("dev", "/imu", 30L, 2L, 2.5))
      .toDF("producer", "topic", "time", "seq", "angular_velocity")
    val fix = Seq(("dev", "/fix", 20L, 3L, 48.8),
      ("dev", "/fix", 40L, 4L, 48.9))
      .toDF("producer", "topic", "time", "seq", "latitude")
    new TopicMapCatalog(Map("/imu" -> imu, "/fix" -> fix))
  }

  private lazy val planner = new Planner(catalog)

  test("merge of disjoint schemas null-fills by name") {
    val rows = planner.plan(spark, "from dev /imu, /fix;")
      .select("topic", "time", "angular_velocity", "latitude")
      .collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("/imu", 10L), ("/fix", 20L), ("/imu", 30L), ("/fix", 40L)))
    val imuRow = rows.head
    assert(!imuRow.isNullAt(2) && imuRow.isNullAt(3))
  }

  test("filters compile against each scan's own schema") {
    val rows = planner.plan(spark,
      "from dev /imu, /fix where /imu.angular_velocity > 1.0 " +
        "or /fix.latitude > 48.85;")
      .select("topic", "time").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("/imu", 30L), ("/fix", 40L)))
  }

  test("field of the other topic's schema errors at plan time") {
    val e = intercept[IllegalArgumentException](
      planner.plan(spark, "from dev /imu where /imu.latitude > 0;"))
    assert(e.getMessage.contains("unknown field"))
  }

  test("as-of join across heterogeneous schemas") {
    val rows = planner.plan(spark,
      "from dev /imu precedes /fix by less than 15 nanoseconds;")
      .select("topic", "time").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // imu@10 matched by fix@20 (<25); imu@30 matched by fix@40 (<45)
    assert(rows == Seq(("/imu", 10L), ("/fix", 20L),
      ("/imu", 30L), ("/fix", 40L)))
  }

  test("explainAnalyze reports per-operator row counters") {
    val metrics = planner.explainAnalyze(spark, "from dev /imu, /fix;")
    assert(metrics.nonEmpty)
    assert(metrics.map(_.rows).filter(_ > 0).sum > 0)
  }
}
