package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ros2.Ros2Msg
import graft.ros2.Ros2Msg._

/** ROS2 IDL schema parsing — expectations ported from the reference's
  * own case tables (server/util/ros2msg/msg_grammar_test.go:78-613,
  * transform_test.go:21-284).
  */
class Ros2MsgSpec extends AnyFunSuite {

  // --- type spec grammar (msg_grammar_test.go TestTypes) ----------------

  private val typeCases = Seq(
    ("int8", TypeSpec("int8", 0, false, false, 0)),
    ("my_package/Foo", TypeSpec("my_package/Foo", 0, false, false, 0)),
    ("int8[]", TypeSpec("int8", 0, true, false, 0)),
    ("int8[10]", TypeSpec("int8", 0, true, false, 10)),
    ("int8[<=10]", TypeSpec("int8", 0, true, true, 10)),
    ("string<=10", TypeSpec("string", 10, false, false, 0)),
    ("string<=10[]", TypeSpec("string", 10, true, false, 0)),
    ("string<=10[10]", TypeSpec("string", 10, true, false, 10)),
    ("string<=10[<=10]", TypeSpec("string", 10, true, true, 10)))

  typeCases.foreach { case (spec, want) =>
    test(s"type spec: $spec") {
      assert(Ros2Msg.parseType(spec) == want)
    }
  }

  // --- fields, defaults, constants, comments ----------------------------

  test("defaults: int, float, quoted strings (both quote styles)") {
    val s = Ros2Msg.parse(
      """int32 foo 42
        |float32 baz 3.14
        |string s1 "bar"
        |string s2 'bar baz'
        |""".stripMargin, "pkg", "M")
    assert(s.name == "pkg/M")
    assert(s.fields == Seq(
      RField("foo", Prim("int32"), Some(42L)),
      RField("baz", Prim("float32"), Some(3.14)),
      RField("s1", Prim("string"), Some("bar")),
      RField("s2", Prim("string"), Some("bar baz"))))
  }

  test("constants parse but are skipped in the resolved schema") {
    val s = Ros2Msg.parse(
      """uint8 NONE=0
        |uint8 SOME = 1
        |int8 bar
        |""".stripMargin, "pkg", "M")
    assert(s.fields == Seq(RField("bar", Prim("int8"))))
  }

  test("comments everywhere: leading, inline, after arrays") {
    val s = Ros2Msg.parse(
      """# leading comment
        |int8 foo # inline comment
        |int8[10] arr #comment without space
        |string q "with # inside quotes"
        |""".stripMargin, "pkg", "M")
    assert(s.fields == Seq(
      RField("foo", Prim("int8")),
      RField("arr", Arr(Prim("int8"), fixedSize = 10)),
      RField("q", Prim("string"), Some("with # inside quotes"))))
  }

  test("ros2-only primitives and bounds") {
    val s = Ros2Msg.parse(
      """wstring w
        |char c
        |byte b
        |string<=10 bounded
        |int8[<=5] barr
        |""".stripMargin, "pkg", "M")
    assert(s.fields == Seq(
      RField("w", Prim("wstring")),
      RField("c", Prim("char")),
      RField("b", Prim("byte")),
      RField("bounded", Prim("string", sizeBound = 10)),
      // a bounded array's bound lives in FixedSize with Bounded set
      // (reference: newType("int8", 0, true, true, 10) for int8[<=10])
      RField("barr",
        Arr(Prim("int8"), fixedSize = 5, bounded = true))))
  }

  // --- sub-definitions (transform_test.go) ------------------------------

  test("subdefs resolve bare and namespaced; Header double-registers") {
    val defn =
      """std_msgs/Header header
        |pkg/Inner inner
        |Inner bare_inner
        |===
        |MSG: std_msgs/Header
        |uint32 seq
        |===
        |MSG: pkg/Inner
        |int16 x
        |""".stripMargin
    val s = Ros2Msg.parse(defn, "pkg", "M")
    val hdr = Rec(Seq(RField("seq", Prim("uint32"))))
    val inner = Rec(Seq(RField("x", Prim("int16"))))
    assert(s.fields == Seq(
      RField("header", hdr),
      RField("inner", inner),
      RField("bare_inner", inner)))
  }

  test("arrays of records keep fixed size, drop the bound like the " +
      "reference") {
    val defn =
      """pkg/Inner[3] fixed
        |pkg/Inner[] dynamic
        |===
        |MSG: pkg/Inner
        |int8 x
        |""".stripMargin
    val s = Ros2Msg.parse(defn, "pkg", "M")
    val inner = Rec(Seq(RField("x", Prim("int8"))))
    assert(s.fields == Seq(
      RField("fixed", Arr(inner, fixedSize = 3)),
      RField("dynamic", Arr(inner))))
  }

  test("errors: unknown subdep, non-namespaced subdef, recursion") {
    val e1 = intercept[IllegalArgumentException](
      Ros2Msg.parse("pkg/Nope x\n", "pkg", "M"))
    assert(e1.getMessage.contains("failed to resolve"))
    // a subdef used as a record type must be namespaced
    // (reference transform.go:108-110)
    val e2 = intercept[IllegalArgumentException](Ros2Msg.parse(
      "Bare x\n===\nMSG: Bare\nint8 y\n", "pkg", "M"))
    assert(e2.getMessage.contains("failed to resolve"))
    val e3 = intercept[IllegalArgumentException](Ros2Msg.parse(
      "pkg/A x\n===\nMSG: pkg/A\npkg/A self\n", "pkg", "M"))
    assert(e3.getMessage.contains("recursive"))
  }

  test("definition with no fields and comment-under-header subdefs") {
    val s = Ros2Msg.parse(
      """pkg/E e
        |===
        |MSG: pkg/E
        |# only a comment
        |""".stripMargin, "pkg", "M")
    assert(s.fields == Seq(RField("e", Rec(Nil))))
  }
}
