package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the LAST ~2000 chars of Bench's stdout
  * (plus an sbt `[success]` trailer eats part of that window), so the
  * single JSON result line must stay short at any registry size — the
  * round-8/9/10 lines all arrived truncated (`parsed: null`). These
  * tests bound the line against the FULL current registry with
  * worst-case-width values, so registry growth that would overflow the
  * driver's window fails here first, before a round's bench record
  * goes dark.
  *
  * Since round 12 `queries` is columnar — `{"n":"<front-coded>",
  * "s":[…]}`, zipped positionally — because the flat map's per-entry
  * framing left only ~3 chars of headroom at 97 entries (one more
  * registry entry would have silently truncated the line). The names
  * string is FRONT-CODED (`Bench.frontCode`: first name verbatim,
  * then one base-36 shared-prefix-length char + suffix per name;
  * decode with `Bench.decodeNames` or `tools/decode_bench.py`) —
  * verbatim sorted names crossed the headroom guard again at 100
  * entries, and the shared family stems are most of their bytes.
  */
class BenchLineSpec extends AnyFunSuite {

  private def lineFor(names: Seq[String], value: Double): String =
    Bench.formatLine(names.map(name => (name, value, value)),
      "/root/testdata/sf0.1", canarySec = 999.99,
      canaryIoSec = 999.99) // worst-case widths

  private def lineAt(value: Double): String =
    lineFor(SparkEntry.queries.keys.toSeq.sorted, value)

  test("stdout line fits the driver's tail capture at the full registry") {
    // Budget arithmetic: the driver keeps the LAST 2000 chars of
    // stdout; after our line sbt appends "\n[success] Total time:
    // NNN s (MM:SS), completed <date>\n" — measured 73 chars, give it
    // 80 for wider dates/durations. So the line must stay under
    // 2000 - 80 = 1920 at worst-case value widths.
    // 999.99 exercises the display cap (worst-case 3-char width)
    val line = lineAt(999.99)
    assert(line.length < 1920,
      s"bench stdout line is ${line.length} bytes; driver tail-capture " +
        "truncates long lines — compact the format (BENCH_r08-r10 lesson)")
  }

  test("registry growth headroom: >=100 chars to spare with an extra " +
      "worst-case-named entry") {
    // the r11 flat-map format had 3 chars of headroom at 97 entries:
    // the NEXT registry entry would have cost the round its perf
    // record. Guard the fix — a hypothetical 98th entry with a
    // worst-case-length name must still leave >=100 chars free.
    val longest = SparkEntry.queries.keys.map(_.length).max
    val names = SparkEntry.queries.keys.toSeq.sorted :+
      ("z" * math.max(longest, 24))
    val line = lineFor(names, 999.99)
    assert(line.length <= 1920 - 100,
      s"line is ${line.length} bytes at ${names.size} entries; " +
        "need >=100 chars of growth headroom under the 1920 budget")
  }

  test("line is valid single-line JSON with the driver's fields") {
    val line = lineAt(1.5)
    assert(!line.contains("\n"))
    for (field <- Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
        "\"queries\":{", "\"spread_max\":", "\"hot\":", "\"canary\":",
        "\"canary_io\":", "\"sf\":"))
      assert(line.contains(field), s"missing $field in: $line")
    // every registered query appears exactly once in the names string
    val namesStr = """"n":"([^"]*)"""".r
      .findFirstMatchIn(line).get.group(1)
    val names = Bench.decodeNames(namesStr)
    assert(names == SparkEntry.queries.keys.toSeq.sorted)
  }

  test("columnar queries decode losslessly: names zip packed seconds " +
      "positionally") {
    val results = Seq(("alpha", 0.4, 1.0), ("beta", -1.0, -1.0),
      ("gamma", 12.34, 1.1))
    val line = Bench.formatLine(results, "sf0.1")
    val names = Bench.decodeNames(""""n":"([^"]*)"""".r
      .findFirstMatchIn(line).get.group(1))
    val secs = Bench.decodeSecs(""""s":"([^"]*)"""".r
      .findFirstMatchIn(line).get.group(1))
    assert(names.length == secs.length && names.length == 3)
    val decoded = names.zip(secs).toMap
    assert(decoded("alpha") == 0.4 && decoded("beta") == -1.0
      && decoded("gamma") == 12.3) // 100 ms wire resolution
  }

  test("packed seconds round-trip at 0.1 s resolution with the " +
      "display cap and failure sentinel") {
    val vs = Seq(0.0, 0.04, 0.05, 0.8, 9.94, 42.37, 99.6, 129.5,
      129.6, 999.99, -1.0)
    val coded = Bench.encodeSecs(vs)
    assert(coded.length == vs.length * 2, coded)
    assert(coded.matches("[0-9a-z-]*"), coded)
    val back = Bench.decodeSecs(coded)
    val want = Seq(0.0, 0.0, 0.1, 0.8, 9.9, 42.4, 99.6, 129.5,
      129.5, 129.5, -1.0) // ties half-up; >=129.55 display-caps at zz
    assert(back == want, s"$back vs $want")
    // "zz" is reserved as the saturation SENTINEL (">= 129.5 s"),
    // never emitted for an exactly-representable value: the largest
    // true reading is "zy" = 129.4, so a 40 s -> 200 s regression is
    // distinguishable on the wire from a genuine ~129.5 s entry
    assert(Bench.encodeSecs(Seq(129.4)) == "zy")
    assert(Bench.encodeSecs(Seq(129.5)) == "zz")
    assert(Bench.encodeSecs(Seq(200.0)) == "zz")
    assert(Bench.encodeSecs(Seq(999.9)) == "zz")
  }

  test("front-coding round-trips the registry and adversarial names") {
    val registry = SparkEntry.queries.keys.toSeq.sorted
    assert(Bench.decodeNames(Bench.frontCode(registry)) == registry)
    // digit-leading suffixes, zero overlap, >35-char shared prefixes,
    // a name that PREFIXES its successor, unsorted order
    val adversarial = Seq("q1_pricing", "q3_topn", "a", "ab",
      "x" * 40 + "a", "x" * 40 + "b", "zz9", "zz91")
    assert(Bench.decodeNames(Bench.frontCode(adversarial)) == adversarial)
    assert(Bench.decodeNames(Bench.frontCode(Seq.empty)) == Seq.empty)
    assert(Bench.decodeNames(Bench.frontCode(Seq("solo"))) == Seq("solo"))
  }

  test("summary fields sit AFTER the per-query pair (truncation keeps " +
      "tails)") {
    val line = lineAt(1.5)
    val qEnd = line.indexOf("\"queries\":{")
    for (field <- Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
        "\"hot\":"))
      assert(line.lastIndexOf(field) > qEnd,
        s"$field must follow the queries pair so a head-truncated " +
          "capture still carries the totals")
    // `value` (the headline total) is the line's final field; one
    // decimal since the r20 line compaction — the same 0.1 s
    // resolution the packed per-entry seconds carry
    assert(line.matches(""".*"value":\d+\.\d}$"""),
      s"total must close the line: ${line.takeRight(40)}")
  }

  test("both canaries are present and positive — the normalization " +
      "rule's inputs (SURVEY §6) can never drop out of a round record") {
    // cross-round total comparisons divide by BOTH canaries (>1.3x
    // drift on either = host-dominated, not code); a line missing or
    // zeroing a canary silently re-opens the r12/r14 ambiguity where
    // nothing could prove the machine (not the code) moved
    val line = Bench.formatLine(Seq(("q", 1.0, 1.0)), "sf0.1",
      canarySec = 0.123, canaryIoSec = 0.456)
    val cpu = """"canary":(-?\d+\.\d+)""".r
      .findFirstMatchIn(line).get.group(1).toDouble
    val io = """"canary_io":(-?\d+\.\d+)""".r
      .findFirstMatchIn(line).get.group(1).toDouble
    assert(cpu > 0.0 && io > 0.0, s"canaries must be positive: $line")
    assert(cpu == 0.12 && io == 0.46) // 2-decimal wire resolution
  }

  test("per-entry spread digits + suspect count self-defend a " +
      "contaminated run (r16/r17 phantom-regression lesson)") {
    val results = Seq(("a", 1.0, 1.1), ("b", 2.0, 3.7),
      ("c", -1.0, -1.0), ("d", 1.0, 9.9), ("e", 1.0, 12.0),
      ("f", 0.3, 4.0)) // sub-half-second jitter: high spread, no flag
    val line = Bench.formatLine(results, "sf0.1")
    // digits zip positionally with the names: round(spread) capped at
    // 9, '-' for unmeasured; >= round(bound) flags that entry
    assert(line.contains(""""sp":"14-994""""), line)
    // suspects: final spread >= bound (default 2.0) AND >= 0.5 s —
    // b, d, e; the 0.3 s entry f stays a digit, never a suspect
    assert(line.contains(""""suspects":3"""), line)
    // a clean run self-certifies with zero suspects
    val clean = Bench.formatLine(
      Seq(("a", 1.0, 1.1), ("b", 2.0, 1.0)), "sf0.1")
    assert(clean.contains(""""sp":"11"""") &&
      clean.contains(""""suspects":0"""), clean)
    // the digit string sits with the queries pair, before the summary
    // tail, and has exactly one char per entry
    val sp = """"sp":"([^"]*)"""".r.findFirstMatchIn(line).get.group(1)
    assert(sp.length == results.size)
  }

  test("failed-query sentinel (-1) survives the compact format") {
    val line = lineAt(-1.0)
    val secs = Bench.decodeSecs(""""s":"([^"]*)"""".r
      .findFirstMatchIn(line).get.group(1))
    assert(secs.nonEmpty && secs.forall(_ == -1.0))
  }

  test("per-query values are exactly 2 packed chars (line-budget " +
      "invariant)") {
    for (v <- Seq(0.04, 0.25, 1.0, 9.94, 9.96, 42.4, 99.4, 99.6, 100.0,
        998.0, 999.99, 12345.0, -1.0)) {
      val line = Bench.formatLine(Seq(("q", v, 1.0)), "sf")
      val m = """"s":"([^"]*)"""".r.findFirstMatchIn(line).get.group(1)
      assert(m.length == 2, s"value $v packed as '$m' (not 2 chars)")
    }
  }

  test("BENCH_DECODED.json body is valid JSON whose values match the " +
      "stdout line's packed seconds (below the 129.5 s saturation " +
      "sentinel) — no consumer ever needs the decoder") {
    val results = Seq(("q_scan", 0.31), ("t_bm25", 4.26),
      ("t_fail", -1.0), ("q_zero", 0.0), ("t_big", 99.94))
    val body = Bench.decodedJson(results)
    // single-line JSON object shape
    assert(!body.contains("\n"))
    assert(body.startsWith("{\"q_scan\":") && body.endsWith("}"))
    // values equal decode(encode(v)) — the packed stdout contract
    val packed = Bench.decodeSecs(Bench.encodeSecs(results.map(_._2)))
    results.map(_._1).zip(packed).foreach { case (name, v) =>
      val field = ("\"" + name + "\":([-0-9.]+)").r
        .findFirstMatchIn(body).get.group(1).toDouble
      assert(math.abs(field - v) < 1e-9, s"$name: $field vs packed $v")
    }
  }
}
