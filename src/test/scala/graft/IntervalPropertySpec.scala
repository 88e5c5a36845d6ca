package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{IntervalJoin, Sessionize}

/** Property checks pinning the bucketized/windowed formulations to
  * naive executable specs on random dense data (the AsofPropertySpec
  * discipline): the bucketized interval join must equal the obvious
  * nested-loop definition at EVERY bucket width, and sessionization
  * must equal a sequential gap fold. Seeded generation keeps runs
  * reproducible.
  */
class IntervalPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private case class P(k: String, t: Long, pid: Long)
  private case class I(k: String, s: Long, e: Long, iid: Long)

  private val genCase: Gen[(List[P], List[I])] = for {
    np <- Gen.choose(1, 12)
    ni <- Gen.choose(1, 8)
    ps <- Gen.listOfN(np, for {
      k <- Gen.oneOf("a", "b")
      t <- Gen.choose(0L, 40L)
    } yield (k, t))
    is <- Gen.listOfN(ni, for {
      k <- Gen.oneOf("a", "b")
      s <- Gen.choose(0L, 40L)
      len <- Gen.choose(0L, 15L)
    } yield (k, s, s + len))
  } yield (
    ps.zipWithIndex.map { case ((k, t), i) => P(k, t, i.toLong) },
    is.zipWithIndex.map { case ((k, s, e), i) => I(k, s, e, i.toLong) })

  test("bucketized point-in-interval equals the nested-loop spec " +
      "at every bucket width") {
    import spark.implicits._
    val params = Gen.Parameters.default
    var seed = Seed(20260813L)
    for (c <- 1 to 25) {
      val (ps, is) = genCase.pureApply(params, seed)
      seed = seed.next
      val want = (for {
        p <- ps; i <- is
        if p.k == i.k && p.t >= i.s && p.t <= i.e
      } yield (p.pid, i.iid)).sorted
      val pdf = ps.map(p => (p.k, p.t, p.pid)).toDF("k", "t", "pid")
      val idf = is.map(i => (i.k, i.s, i.e, i.iid))
        .toDF("k", "s", "e", "iid")
      for (width <- Seq(1L, 3L, 7L, 64L)) {
        val got = IntervalJoin.pointInInterval(pdf, idf, Seq("k"),
          "t", "s", "e", bucketWidth = width)
          .select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        assert(got == want, s"case $c width $width: ps=$ps is=$is")
      }
    }
  }

  test("bucketized overlaps equals the nested-loop spec at every " +
      "bucket width") {
    import spark.implicits._
    val params = Gen.Parameters.default
    var seed = Seed(20260814L)
    for (c <- 1 to 15) {
      val (_, is) = genCase.pureApply(params, seed)
      seed = seed.next
      val (l, r) = is.splitAt(is.size / 2)
      if (l.nonEmpty && r.nonEmpty) {
        val want = (for {
          a <- l; b <- r
          if a.k == b.k && a.s <= b.e && b.s <= a.e
        } yield (a.iid, b.iid)).sorted
        val ldf = l.map(i => (i.k, i.s, i.e, i.iid))
          .toDF("k", "ls", "le", "lid")
        val rdf = r.map(i => (i.k, i.s, i.e, i.iid))
          .toDF("k", "rs", "re", "rid")
        for (width <- Seq(1L, 5L, 64L)) {
          val got = IntervalJoin.overlaps(ldf, rdf, Seq("k"),
            "ls", "le", "rs", "re", bucketWidth = width)
            .select("lid", "rid").collect()
            .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
          assert(got == want, s"case $c width $width: l=$l r=$r")
        }
      }
    }
  }

  test("windowed sessionize equals the sequential gap fold") {
    import spark.implicits._
    val params = Gen.Parameters.default
    var seed = Seed(20260815L)
    for (c <- 1 to 25) {
      val (ps, _) = genCase.pureApply(params, seed)
      seed = seed.next
      val gap = (c % 5) + 1L
      // naive: per key, sort by (t, pid), fold sessions
      val want = ps.groupBy(_.k).toSeq.flatMap { case (k, rows) =>
        val sorted = rows.sortBy(r => (r.t, r.pid))
        var sid = 0L; var prev = Long.MinValue
        sorted.map { r =>
          if (prev == Long.MinValue || r.t - prev > gap) sid += 1
          prev = r.t
          (k, r.pid, sid)
        }
      }.sorted
      val got = Sessionize.assign(
        ps.map(p => (p.k, p.t, p.pid)).toDF("k", "t", "pid"),
        Seq("k"), "t", gap, tieCols = Seq("pid"))
        .select("k", "pid", "session_id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      assert(got == want, s"case $c gap $gap: ps=$ps")
    }
  }
}
