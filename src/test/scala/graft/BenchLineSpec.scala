package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the TAIL of Bench's stdout, so the single
  * JSON result line must stay short at any registry size — the round-8
  * line grew to ~4.5 KB with a 67-entry spread map and arrived
  * truncated (BENCH_r08 parsed:null). These tests bound the line
  * against the FULL current registry with worst-case-width values, so
  * registry growth that would overflow the driver's window fails here
  * first, before a round's bench record goes dark.
  */
class BenchLineSpec extends AnyFunSuite {

  private def lineAt(value: Double): String = {
    val results = SparkEntry.queries.keys.toSeq.sorted
      .map(name => (name, value, value))
    Bench.formatLine(results, 12.34, 12.34, 300, "/root/testdata/sf0.1")
  }

  test("stdout line stays under 2 KB at the full query registry") {
    // 3-digit seconds (999.99) is worst-case width for a sane run
    val line = lineAt(999.99)
    assert(line.length < 2048,
      s"bench stdout line is ${line.length} bytes; driver tail-capture " +
        "truncates long lines — compact the format (BENCH_r08 lesson)")
  }

  test("line is valid single-line JSON with the driver's fields") {
    val line = lineAt(1.5)
    assert(!line.contains("\n"))
    for (field <- Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
        "\"queries\":{", "\"spread_max\":", "\"load\":{", "\"sf\":"))
      assert(line.contains(field), s"missing $field in: $line")
    // every registered query appears exactly once
    for (name <- SparkEntry.queries.keys)
      assert(line.contains("\"" + name + "\":"), s"missing query $name")
  }

  test("failed-query sentinel (-1) survives the 2-decimal format") {
    val line = lineAt(-1.0)
    assert(line.contains(":-1.00"))
  }
}
