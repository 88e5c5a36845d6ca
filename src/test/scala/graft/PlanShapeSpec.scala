package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plan.PlanShape
import graft.ql.{Parser, Query}

/** Plan-shape golden tests — the reference's planner expectations
  * ported verbatim (reference: server/plan/plan_test.go:66-249; the
  * invalid-plan table at 18-64). Comparison strips whitespace like the
  * reference's testutils.StripSpace.
  */
class PlanShapeSpec extends AnyFunSuite {

  private def producersFor(query: String): Seq[String] =
    if (query.contains("/no-dev1")) Seq("device2")
    else Seq("device1", "device2")

  private def render(query: String, producers: Seq[String]): String =
    PlanShape.render(
      Parser.parse(query).asInstanceOf[Query], producers)

  private def strip(s: String): String = s.replaceAll("\\s+", "")

  private val cases: Seq[(String, String, String, Seq[String])] = Seq(
    ("single scan", "from device a;",
      "[scan (a db device all-time)]", Seq("device")),
    ("scan two devices", "from device1, device2 a,b;",
      """[merge
        [scan (a db device1 all-time)] [scan (b db device1 all-time)]
        [scan (a db device2 all-time)] [scan (b db device2 all-time)]]""",
      Seq("device1", "device2")),
    ("wildcard", "from * a,b;",
      """[merge
        [scan (a db device1 all-time)] [scan (b db device1 all-time)]
        [scan (a db device2 all-time)] [scan (b db device2 all-time)]]""",
      Seq("device1", "device2")),
    ("wildcard drops devices without matching tables",
      "from * /no-dev1;",
      "[scan (/no-dev1 db device2 all-time)]", Seq("device2")),
    ("wildcard with qualifier", "from * a where a.foo = 10;",
      "[merge [scan (a db device1 all-time) [binexp [= a.foo 10]]] " +
        "[scan (a db device2 all-time) [binexp [= a.foo 10]]]]",
      Seq("device1", "device2")),
    ("descending scan", "from device a desc;",
      "[scan desc (a db device all-time)]", Seq("device")),
    ("single scan with a where clause", "from device a where a.foo = 10;",
      "[scan (a db device all-time) [binexp [= a.foo 10]]]",
      Seq("device")),
    ("single scan with multiple where clauses",
      "from device a where a.foo = 10 and a.bar = 20;",
      "[scan (a db device all-time) [and [binexp [= a.foo 10]] " +
        "[binexp [= a.bar 20]]]]", Seq("device")),
    ("single scan with or condition",
      "from device a where a.foo = 10 or a.bar = 20;",
      "[scan (a db device all-time) [or [binexp [= a.foo 10]] " +
        "[binexp [= a.bar 20]]]]", Seq("device")),
    ("single scan with an alias", "from device a as b;",
      "[scan (a b db device all-time)]", Seq("device")),
    ("aliased where clauses are resolved",
      "from device a as b where b.foo = 1;",
      "[scan (a b db device all-time) [binexp [= b.foo 1]]]",
      Seq("device")),
    ("multiple aliased where clauses are resolved",
      "from device a as b, c as d where b.foo = 1 or d.bar = 2;",
      """[merge
         [scan (a b db device all-time) [binexp [= b.foo 1]]]
         [scan (c d db device all-time) [binexp [= d.bar 2]]]]""",
      Seq("device")),
    ("basic mj", "from device a, b;",
      "[merge [scan (a db device all-time)] [scan (b db device all-time)]]",
      Seq("device")),
    ("ternary mj", "from device a, b, c;",
      """[merge [scan (a db device all-time)]
         [scan (b db device all-time)] [scan (c db device all-time)]]""",
      Seq("device")),
    ("scan with where clause and limit",
      "from device a where a.b = 1 limit 10;",
      "[limit 10 [scan (a db device all-time) [binexp [= a.b 1]]]]",
      Seq("device")),
    ("scan with limit and offset", "from device a limit 10 offset 5;",
      "[limit 10 [offset 5 [scan (a db device all-time)]]]",
      Seq("device")),
    ("merge join with descending", "from device a, b desc;",
      """[merge desc [scan desc (a db device all-time)]
         [scan desc (b db device all-time)]]""", Seq("device")),
    ("merge join with where clause",
      "from device a, b where a.b = 10 or b.c = 20;",
      """[merge [scan (a db device all-time) [binexp [= a.b 10]]]
         [scan (b db device all-time) [binexp [= b.c 20]]]]""",
      Seq("device")),
    ("asof join with where clause",
      "from device a precedes b where b.c = 10 or a.b = 20;",
      """[asof (precedes full)
         [scan (a db device all-time) [binexp [= a.b 20]]]
         [scan (b db device all-time) [binexp [= b.c 10]]]]""",
      Seq("device")),
    ("asof join with restriction",
      "from device a precedes b by less than 5 seconds;",
      """[asof (precedes full seconds 5)
         [scan (a db device all-time)] [scan (b db device all-time)]]""",
      Seq("device")),
    ("asof join with aliasing",
      "from device a as foo precedes b as bar by less than 5 seconds;",
      """[asof (precedes full seconds 5)
         [scan (a foo db device all-time)] [scan (b bar db device all-time)]]""",
      Seq("device")),
    ("trivial subexpressions are pulled up",
      "from devices a where (a.foo = 10);",
      "[scan (a db devices all-time) [binexp [= a.foo 10]]]",
      Seq("devices")),
    ("grouped subexpressions on a single scan",
      "from devices a where (a.foo = 10 or a.bar = 20) and a.baz = 30;",
      """[scan (a db devices all-time)
         [and [or [binexp [= a.foo 10]] [binexp [= a.bar 20]]]
         [binexp [= a.baz 30]]]]""", Seq("devices")),
    ("grouped subexpressions on multiple scans",
      "from devices a, b where (a.foo = 10 or a.bar = 20) or b.baz = 30;",
      """[merge
         [scan (a db devices all-time) [or [binexp [= a.foo 10]] [binexp [= a.bar 20]]]]
         [scan (b db devices all-time) [binexp [= b.baz 30]]]]""",
      Seq("devices")),
    ("merge join with aliases", "from device a as b, c as d;",
      """[merge [scan (a b db device all-time)]
         [scan (c d db device all-time)]]""", Seq("device"))
  )

  cases.foreach { case (name, query, expected, producers) =>
    test(name) {
      assert(strip(render(query, producers)) == strip(expected), query)
    }
  }

  // --- invalid plans (plan_test.go:18-64) -------------------------------

  private val invalid: Seq[(String, String, String)] = Seq(
    ("and expression spanning tables",
      "from device a, b where a.foo = 10 and b.bar = 20;",
      "more than one alias"),
    ("grouped or expression spanning tables",
      "from device a, b where (a.foo = 10 or b.bar = 20);",
      "more than one alias"),
    ("multiple aliases to same table in one scan",
      "from device a as b where a.foo = 10 and b.bar = 20;",
      "more than one alias"),
    ("where clause qualified with alias that doesn't exist",
      "from device a where b.foo = 10;",
      "unresolved table alias: b")
  )

  invalid.foreach { case (name, query, msg) =>
    test(s"invalid: $name") {
      val e = intercept[Exception](render(query, Seq("device")))
      assert(e.getMessage.contains(msg), e.getMessage)
    }
  }

  test("invalid: where clauses must be qualified (parse-time)") {
    val e = intercept[Exception](
      Parser.parse("from device a where foo = 10;"))
    assert(e.getMessage.contains("must be qualified with a dot"))
  }

  // plan_test.go:249-276 TestQueryCompilationErrors
  test("invalid: alias reference against aliased scan") {
    val e = intercept[Exception](
      render("from device /fix as f where b.foo = 10;", Seq("device")))
    assert(e.getMessage.contains("unresolved table alias: b"))
  }

  test("invalid: alias reference against unaliased scan") {
    val e = intercept[Exception](
      render("from device /fix where b.foo = 10;", Seq("device")))
    assert(e.getMessage.contains("unresolved table alias: b"))
  }
}
