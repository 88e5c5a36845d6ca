package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ql._

/** Parser robustness beyond the reference's own golden tables:
  * generated VALID queries must parse to the AST they were built from,
  * and arbitrary garbage must fail with a clean IllegalArgumentException
  * — never a stack overflow, NPE, or hang. A front end that dies
  * unpredictably on bad input is a denial-of-service surface once the
  * HTTP route exposes it.
  */
class ParserFuzzSpec extends AnyFunSuite {

  private def topicsOf(sel: Select): Seq[String] = sel match {
    case Entity(t, _)   => Seq(t)
    case MergeSel(l, r) => topicsOf(l) ++ topicsOf(r)
    case a: AsofSel     => topicsOf(a.left) ++ topicsOf(a.right)
  }

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private case class Built(ql: String, producers: Option[Seq[String]],
      topics: Seq[String], desc: Boolean, limit: Option[Long],
      offset: Option[Long], between: Option[(Long, Long)])

  private val genQuery: Gen[Built] = for {
    star <- Gen.oneOf(true, false)
    prods <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, ident))
    nTopics <- Gen.choose(1, 3)
    topics <- Gen.listOfN(nTopics, ident.map("/" + _))
    between <- Gen.option(for {
      a <- Gen.choose(0L, 1000L)
      d <- Gen.choose(1L, 1000L)
    } yield (a, a + d))
    desc <- Gen.oneOf(true, false)
    limit <- Gen.option(Gen.choose(1L, 99L))
    offset <- Gen.option(Gen.choose(1L, 99L))
  } yield {
    val fromPart = if (star) "*" else prods.distinct.mkString(", ")
    val betweenPart = between
      .map { case (a, b) => s" between $a and $b" }.getOrElse("")
    val descPart = if (desc) " desc" else ""
    val limitPart = limit.map(n => s" limit $n").getOrElse("")
    val offsetPart = offset.map(n => s" offset $n").getOrElse("")
    Built(
      s"from $fromPart$betweenPart ${topics.mkString(", ")}" +
        s"$descPart$limitPart$offsetPart;",
      if (star) None else Some(prods.distinct),
      topics, desc, limit, offset, between)
  }

  test("generated valid queries parse to the AST they were built from") {
    val params = Gen.Parameters.default
    var seed = Seed(20260816L)
    for (_ <- 1 to 200) {
      val b = genQuery.pureApply(params, seed)
      seed = seed.next
      Parser.parse(b.ql) match {
        case q: Query =>
          (q.from, b.producers) match {
            case (AllProducers, None) => ()
            case (ProducerList(ns), Some(want)) => assert(ns == want, b.ql)
            case other => fail(s"from mismatch $other for ${b.ql}")
          }
          assert(topicsOf(q.select) == b.topics, b.ql)
          assert(q.descending == b.desc, b.ql)
          assert(q.limit == b.limit && q.offset == b.offset, b.ql)
          assert(q.between == b.between, b.ql)
        case other => fail(s"parsed to $other for ${b.ql}")
      }
    }
  }

  test("garbage never escapes as anything but the two clean error " +
      "types the HTTP layer maps to 400") {
    val junk: Gen[String] = Gen.oneOf(
      // random printable noise
      Gen.listOfN(30, Gen.choose(32, 126).map(_.toChar)).map(_.mkString),
      // grammar-adjacent mutations
      genQuery.map(_.ql).flatMap { ql =>
        Gen.choose(0, math.max(ql.length - 1, 0)).map { i =>
          ql.substring(0, i) + "☃" + ql.substring(math.min(i + 1,
            ql.length))
        }
      },
      // truncations (lost semicolons, dangling operators)
      genQuery.map(_.ql).flatMap(ql =>
        Gen.choose(0, ql.length).map(ql.substring(0, _))))
    val params = Gen.Parameters.default
    var seed = Seed(20260817L)
    for (_ <- 1 to 300) {
      val s = junk.pureApply(params, seed)
      seed = seed.next
      try { Parser.parse(s); () }
      catch {
        // exactly the set Dp3Http maps to 400 (Dp3Http.scala:289-293)
        case _: IllegalArgumentException => ()
        case _: Parser.ParseError => ()
        case e: Throwable =>
          fail(s"'$s' escaped with ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }
}
