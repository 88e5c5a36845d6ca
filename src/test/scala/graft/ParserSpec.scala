package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ql._

/** Grammar tests — structural assertions mirroring the reference's
  * table-driven parser tests (reference: server/ql/grammar_test.go).
  */
class ParserSpec extends AnyFunSuite {

  private def q(s: String): Query =
    Parser.parse(s).asInstanceOf[Query]

  test("bare scan") {
    val p = q("from device t0;")
    assert(p.from == ProducerList(Seq("device")))
    assert(p.select == Entity("t0", None))
    assert(!p.descending && p.limit.isEmpty && p.where.isEmpty)
  }

  test("producer wildcard") {
    assert(q("from * t0;").from == AllProducers)
  }

  test("topic names may contain slashes and dots") {
    assert(q("from dev /diagnostics.data;").select ==
      Entity("/diagnostics.data", None))
  }

  test("between with integers") {
    assert(q("from d between 10 and 20 t0;").between.contains((10L, 20L)))
  }

  test("between with ISO dates") {
    val p = q("from d between '2024-01-01' and '2024-01-02T03:04:05' t0;")
    val (a, b) = p.between.get
    assert(a == 1704067200000000000L)
    assert(b == 1704164645000000000L)
  }

  test("merge join right-nests and aliases parse") {
    val p = q("from d t0 as a, t1, t2 as c;")
    assert(p.select == MergeSel(Entity("t0", Some("a")),
      MergeSel(Entity("t1", None), Entity("t2", Some("c")))))
  }

  test("asof with units") {
    val cases = Map("nanoseconds" -> 7L, "microseconds" -> 7000L,
      "milliseconds" -> 7000000L, "seconds" -> 7000000000L,
      "minutes" -> 420000000000L)
    cases.foreach { case (unit, ns) =>
      val p = q(s"from d t0 precedes t1 by less than 7 $unit;")
      val a = p.select.asInstanceOf[AsofSel]
      assert(a.thresholdNs == ns, unit)
      assert(a.dir == Precedes && !a.immediate)
    }
  }

  test("asof immediate succeeds") {
    val a = q("from d t0 succeeds immediate t1;").select
      .asInstanceOf[AsofSel]
    assert(a.dir == Succeeds && a.immediate && a.thresholdNs == 0L)
  }

  test("where expression tree") {
    val p = q("from d t0 where t0.a = 1 and t0.b != 2.5 or t0.c ~ 'x';")
    val e = p.where.get.asInstanceOf[OrExpr]
    assert(e.disjuncts.size == 2)
    val and = e.disjuncts.head.asInstanceOf[AndExpr]
    assert(and.conjuncts == Seq(
      Cmp("t0", "a", Eq, IntLit(1)),
      Cmp("t0", "b", Neq, FloatLit(2.5))))
    assert(e.disjuncts(1) == Cmp("t0", "c", Regex, StrLit("x")))
  }

  test("parenthesized subexpression stays grouped") {
    val p = q("from d t0 where (t0.a = 1 or t0.a = 2) and t0.b = 3;")
    val and = p.where.get.asInstanceOf[AndExpr]
    assert(and.conjuncts.head.asInstanceOf[GroupExpr]
      .inner.isInstanceOf[OrExpr])
    // trivial group pulled up like the reference
    assert(q("from d t0 where (t0.a = 1);").where.get.isInstanceOf[Cmp])
  }

  test("string literal escapes") {
    val p = q("""from d t0 where t0.s = 'it\'s';""")
    assert(p.where.get == Cmp("t0", "s", Eq, StrLit("it's")))
  }

  test("paging terms") {
    val p = q("from d t0 limit 10 offset 5;")
    assert(p.limit.contains(10L) && p.offset.contains(5L))
  }

  test("explain flag") {
    assert(q("explain from d t0;").explain)
  }

  test("truncate statement") {
    assert(Parser.parse("truncate dev t0 now;") ==
      TruncateStmt("dev", "t0", None))
    assert(Parser.parse("truncate dev t0 12345;") ==
      TruncateStmt("dev", "t0", Some(12345L)))
  }

  test("missing semicolon rejected") {
    assertThrows[Parser.ParseError](Parser.parse("from d t0"))
  }

  test("unqualified where field rejected") {
    assertThrows[Parser.ParseError](
      Parser.parse("from d t0 where u8 = 1;"))
  }

  test("neighbors parses to an AsofSel by default; strict-parity " +
      "mode restores the reference's error") {
    // the reference parses the keyword but errors at compile
    // (server/executor/executor.go:206-207); the engine implements it
    // as a documented extension (Ast.scala Neighbors), with the
    // error-parity path behind strictParity
    val q = Parser.parse("from d t0 neighbors immediate t1 " +
      "by less than 5 seconds;").asInstanceOf[Query]
    q.select match {
      case AsofSel(Entity("t0", None), Entity("t1", None), Neighbors,
          true, ns, Some((5L, "seconds"))) =>
        assert(ns == 5000000000L)
      case other => fail(s"unexpected: $other")
    }
    assertThrows[Parser.ParseError](
      Parser.parse("from d t0 neighbors t1;", strictParity = true))
    // the deployment-wide system property flips every call site
    // (planner, HTTP, CLI) without threading the flag
    System.setProperty("graft.ql.strictParity", "true")
    try assertThrows[Parser.ParseError](
      Parser.parse("from d t0 neighbors t1;"))
    finally System.clearProperty("graft.ql.strictParity")
    Parser.parse("from d t0 neighbors t1;") // default again: parses
  }
}
