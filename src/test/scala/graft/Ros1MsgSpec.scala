package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.mcap.Mcap
import graft.ros1.Ros1Msg

/** ros1msg schema parsing + payload decoding, including the reference's
  * all-primitives fixture schema (reference:
  * server/executor/executor_test.go:327-388) and the standard 2-field
  * schema (server/mcap/testutils.go:79-130).
  */
class Ros1MsgSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val allPrims =
    """uint8 u8
      |uint16 u16
      |uint32 u32
      |uint64 u64
      |int8 i8
      |int16 i16
      |int32 i32
      |int64 i64
      |float32 f32
      |float64 f64
      |string s
      |""".stripMargin

  private def allPrimsPayload(c: Int): Array[Byte] = {
    val s = "hello".getBytes
    val buf = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(c.toByte)             // u8
    buf.putShort(c.toShort)       // u16
    buf.putInt(c)                 // u32
    buf.putLong(c.toLong)         // u64
    buf.put(c.toByte)             // i8
    buf.putShort(c.toShort)       // i16
    buf.putInt(c)                 // i32
    buf.putLong(c.toLong)         // i64
    buf.putFloat(c.toFloat)       // f32
    buf.putDouble(c.toDouble)     // f64
    buf.putInt(s.length); buf.put(s)
    buf.flip()
    val out = new Array[Byte](buf.limit()); buf.get(out); out
  }

  test("parse + decode the all-primitives schema, unsigned widened") {
    val d = Ros1Msg.parse(allPrims)
    assert(d.fields.size == 11)
    val row = Ros1Msg.decode(d, allPrimsPayload(3))
    assert(row.getShort(0) == 3)   // u8 -> Short
    assert(row.getInt(1) == 3)     // u16 -> Int
    assert(row.getLong(2) == 3L)   // u32 -> Long
    assert(row.getLong(3) == 3L)   // u64 -> Long
    assert(row.getByte(4) == 3)    // i8
    assert(row.getFloat(8) == 3.0f)
    assert(row.getDouble(9) == 3.0)
    assert(row.getString(10) == "hello")
  }

  test("unsigned widening at the boundary values") {
    val d = Ros1Msg.parse("uint8 x\nuint16 y\nuint32 z")
    val buf = ByteBuffer.allocate(7).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0xff.toByte).putShort(0xffff.toShort).putInt(0xffffffff)
    val row = Ros1Msg.decode(d, buf.array())
    assert(row.getShort(0) == 255)
    assert(row.getInt(1) == 65535)
    assert(row.getLong(2) == 4294967295L)
  }

  test("time decodes to nanoseconds; arrays fixed and variable") {
    val d = Ros1Msg.parse(
      "time stamp\nfloat64[3] accel\nint32[] extras")
    val buf = ByteBuffer.allocate(4 + 4 + 24 + 4 + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(2).putInt(500)                  // time 2s + 500ns
    buf.putDouble(1.5).putDouble(2.5).putDouble(3.5)
    buf.putInt(2).putInt(7).putInt(8)          // var array [7, 8]
    val row = Ros1Msg.decode(d, buf.array())
    assert(row.getLong(0) == 2000000500L)
    assert(row.getSeq[Double](1) == Seq(1.5, 2.5, 3.5))
    assert(row.getSeq[Int](2) == Seq(7, 8))
  }

  test("comments and constants are skipped; non-primitive rejected") {
    val d = Ros1Msg.parse(
      "# header comment\nint32 OK=1\nfloat32 v # trailing\n")
    assert(d.fields.map(_.name) == Seq("v"))
    assertThrows[IllegalArgumentException](
      Ros1Msg.parse("geometry_msgs/Pose pose"))
  }

  test("mcap -> decodeDf -> flat view end to end") {
    val defn = "string data\nint16 count"
    def payload(s: String, c: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(4 + s.length + 2)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(s.length).put(s.getBytes).putShort(c.toShort)
      b.array()
    }
    val w = new Mcap.Writer
    w.writeSchema(Mcap.SchemaRec(1, "package/test", "ros1msg",
      defn.getBytes))
    w.writeChannel(Mcap.ChannelRec(0, 1, "topic-0", "ros1"))
    w.writeMessage(Mcap.MessageRec(0, 1L, 10L, 10L,
      payload("hello", 2024)))
    val dir = java.nio.file.Files.createTempDirectory("graft-ros1")
    java.nio.file.Files.write(dir.resolve("dev.mcap"), w.finish())

    val raw = Mcap.load(spark, dir.toString)
    val decoded = Ros1Msg.decodeDf(raw, defn)
    val flat = decoded.select(
      (col("topic") +: col("time") +:
        Ros1Msg.flatColumns(Ros1Msg.parse(defn))): _*)
    val row = flat.collect().head
    assert(row.getString(0) == "topic-0")
    assert(row.getLong(1) == 10L)
    assert(row.getString(2) == "hello")
    assert(row.getShort(3) == 2024)
  }

  test("fixed arrays under 10 flatten to name[i]; var arrays excluded") {
    val d = Ros1Msg.parse("float64[3] a\nint32[] v\nfloat64[12] big")
    val names = Ros1Msg.flatColumns(d).map(_.toString)
    assert(names.exists(_.contains("a[0]")))
    assert(names.exists(_.contains("a[2]")))
    assert(!names.exists(_.contains("v")))
    assert(!names.exists(_.contains("big")))
  }

  // --- nested records (reference transform.go:44-165) -------------------

  private val pointStamped =
    """Header header
      |geometry_msgs/Point point
      |===
      |MSG: std_msgs/Header
      |uint32 seq
      |time stamp
      |string frame_id
      |===
      |MSG: geometry_msgs/Point
      |float64 x
      |float64 y
      |float64 z
      |""".stripMargin

  private def pointStampedPayload(seq: Int, frame: String,
      x: Double, y: Double, z: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + 8 + 4 + frame.length + 24)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(seq)
    b.putInt(7).putInt(500) // stamp: 7s + 500ns
    b.putInt(frame.length).put(frame.getBytes)
    b.putDouble(x).putDouble(y).putDouble(z)
    b.array()
  }

  test("nested MSG: sub-definitions resolve; Header decodes") {
    val d = Ros1Msg.parse(pointStamped, pkg = "geometry_msgs")
    assert(d.fields.map(_.name) == Seq("header", "point"))
    val row = Ros1Msg.decode(d,
      pointStampedPayload(42, "base_link", 1.5, 2.5, 3.5))
    val header = row.getStruct(0)
    assert(header.getLong(0) == 42L)          // uint32 seq -> Long
    assert(header.getLong(1) == 7000000500L)  // time -> ns
    assert(header.getString(2) == "base_link")
    val point = row.getStruct(1)
    assert(point.getDouble(0) == 1.5)
    assert(point.getDouble(2) == 3.5)
  }

  test("flat view order matches AnalyzeSchema: records to the back") {
    // reference parser.go:551-589 — the queue is seeded per TOP-LEVEL
    // field, so top-level {a, b{c}, d} stays in source order a, b.c, d,
    // but WITHIN one field's subtree record subfields defer to the
    // back: o{a, b{c}, d} flattens o.a, o.d, o.b.c.
    val d = Ros1Msg.parse(
      """int8 a
        |Sub b
        |int8 d
        |===
        |MSG: pkg/Sub
        |int8 c
        |""".stripMargin, pkg = "pkg")
    assert(Ros1Msg.flatFields(d).map(_._1) == Seq("a", "b.c", "d"))
    val nested = Ros1Msg.parse(
      """Outer o
        |===
        |MSG: pkg/Outer
        |int8 a
        |Sub b
        |int8 d
        |===
        |MSG: pkg/Sub
        |int8 c
        |""".stripMargin, pkg = "pkg")
    assert(Ros1Msg.flatFields(nested).map(_._1) ==
      Seq("o.a", "o.d", "o.b.c"))
    // complex fixed-length array: parser_test.go "complex fixed-length array"
    val d2 = Ros1Msg.parse(
      """int8 field1
        |Sub[2] field2
        |===
        |MSG: pkg/Sub
        |int16 subfield1
        |""".stripMargin, pkg = "pkg")
    assert(Ros1Msg.flatFields(d2).map(_._1) ==
      Seq("field1", "field2[0].subfield1", "field2[1].subfield1"))
  }

  test("nested decode end to end through a DataFrame flat projection") {
    import spark.implicits._
    val raw = Seq(
      ("t", 10L, pointStampedPayload(1, "map", 0.1, 0.2, 0.3)),
      ("t", 20L, pointStampedPayload(2, "odom", 4.0, 5.0, 6.0))
    ).toDF("topic", "time", "data")
    val d = Ros1Msg.parse(pointStamped, pkg = "geometry_msgs")
    val flat = Ros1Msg.decodeDf(raw, pointStamped, pkg = "geometry_msgs")
      .select((col("time") +: Ros1Msg.flatColumns(d)): _*)
    assert(flat.columns.toSeq == Seq("time", "header.seq",
      "header.stamp", "header.frame_id", "point.x", "point.y", "point.z"))
    val rows = flat.orderBy("time").collect()
    assert(rows(0).getLong(1) == 1L)
    assert(rows(0).getString(3) == "map")
    assert(rows(1).getDouble(6) == 6.0)
  }

  test("parses the reference's full real-world schema corpus") {
    val dir = new java.io.File(sys.env.getOrElse(
      "GRAFT_ROS1_SCHEMA_CORPUS",
      "/root/reference/server/util/ros1msg/testdata/schemas"))
    assume(dir.isDirectory, s"schema corpus not present at $dir")
    val files = dir.listFiles().filter(_.getName.endsWith(".msg")).sorted
    assert(files.length > 30) // the real corpus, not a stub dir
    files.foreach { f =>
      val pkg = f.getName.split("-")(0)
      val defn = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val d = Ros1Msg.parse(defn, pkg = pkg)
      assert(d.fields.nonEmpty || defn.linesIterator.forall(l =>
        l.trim.isEmpty || l.trim.startsWith("#")), f.getName)
      // the flat view must also be constructible for every schema
      Ros1Msg.flatColumns(d)
    }
  }

  test("corpus spot checks: flattened paths and Spark types match " +
      "hand-derived expectations for real production schemas") {
    val dir = new java.io.File(sys.env.getOrElse(
      "GRAFT_ROS1_SCHEMA_CORPUS",
      "/root/reference/server/util/ros1msg/testdata/schemas"))
    assume(dir.isDirectory, s"schema corpus not present at $dir")
    def flatNames(file: String): Seq[String] = {
      val pkg = file.split("-")(0)
      val defn = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, file).toPath), "UTF-8")
      Ros1Msg.flatFields(Ros1Msg.parse(defn, pkg = pkg)).map(_._1)
    }
    def struct(file: String): org.apache.spark.sql.types.StructType = {
      val pkg = file.split("-")(0)
      val defn = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, file).toPath), "UTF-8")
      Ros1Msg.structType(Ros1Msg.parse(defn, pkg = pkg))
    }
    import org.apache.spark.sql.types._

    // nav_msgs/Odometry: 3 levels of record nesting + a 36-element
    // covariance (>= 10: excluded from the flat view). Record
    // subfields go to the BACK of the per-field queue (the reference
    // AnalyzeSchema discipline), so position/orientation leaves come
    // after the excluded covariance is visited.
    assert(flatNames("nav_msgs-Odometry.msg") == Seq(
      "header.seq", "header.stamp", "header.frame_id",
      "child_frame_id",
      "pose.pose.position.x", "pose.pose.position.y",
      "pose.pose.position.z",
      "pose.pose.orientation.x", "pose.pose.orientation.y",
      "pose.pose.orientation.z", "pose.pose.orientation.w",
      "twist.twist.linear.x", "twist.twist.linear.y",
      "twist.twist.linear.z",
      "twist.twist.angular.x", "twist.twist.angular.y",
      "twist.twist.angular.z"))
    val odo = struct("nav_msgs-Odometry.msg")
    val header = odo("header").dataType.asInstanceOf[StructType]
    assert(header("stamp").dataType == LongType)  // time -> epoch ns
    assert(header("seq").dataType == LongType)    // uint32 widened
    assert(odo("child_frame_id").dataType == StringType)
    val poseCov = odo("pose").dataType.asInstanceOf[StructType]
    assert(poseCov("covariance").dataType
      == ArrayType(DoubleType, containsNull = false))

    // geometry_msgs/Twist: bare Vector3 names resolve against the
    // parent package's namespaced sub-definitions
    assert(flatNames("geometry_msgs-Twist.msg") == Seq(
      "linear.x", "linear.y", "linear.z",
      "angular.x", "angular.y", "angular.z"))

    // sensor_msgs/CameraInfo: fixed arrays under 10 expand at the
    // FRONT (K[0..8], R[0..8]); float64[12] P and float64[] D are
    // excluded; the roi record flattens after the scalars
    assert(flatNames("sensor_msgs-CameraInfo.msg") == Seq(
      "header.seq", "header.stamp", "header.frame_id",
      "height", "width", "distortion_model") ++
      (0 until 9).map(i => s"K[$i]") ++
      (0 until 9).map(i => s"R[$i]") ++ Seq(
      "binning_x", "binning_y",
      "roi.x_offset", "roi.y_offset", "roi.height", "roi.width",
      "roi.do_rectify"))
    val cam = struct("sensor_msgs-CameraInfo.msg")
    assert(cam("K").dataType == ArrayType(DoubleType, false))
    assert(cam("height").dataType == LongType) // uint32
    assert(cam("roi").dataType.asInstanceOf[StructType]("do_rectify")
      .dataType == BooleanType)

    // rosgraph_msgs/Log: byte constants (DEBUG=1...) are skipped, the
    // string[] topics array is excluded, byte widens to short
    assert(flatNames("rosgraph_msgs-Log.msg") == Seq(
      "header.seq", "header.stamp", "header.frame_id",
      "level", "name", "msg", "file", "function", "line"))
    val log = struct("rosgraph_msgs-Log.msg")
    assert(log("level").dataType == ShortType)  // byte widened
    assert(log("line").dataType == LongType)    // uint32 widened
    assert(log("topics").dataType == ArrayType(StringType, false))
  }

  test("recursive type references error instead of looping") {
    val defn =
      """Loop a
        |===
        |MSG: pkg/Loop
        |Loop next
        |""".stripMargin
    val e = intercept[IllegalArgumentException](
      Ros1Msg.parse(defn, pkg = "pkg"))
    assert(e.getMessage.contains("recursive"))
  }
}
