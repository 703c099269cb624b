package graft

import org.scalatest.funsuite.AnyFunSuite

/** Capacity budget for the ONE bare JSON line `graft.Bench` prints: the
  * harness parses it from a ~2000-char output tail, and a silent overflow
  * already cost round 8 its artifact (BENCH_r08 parsed:null). This spec
  * fails BEFORE the artifact does — at build time, not bench time — and
  * pins the >=160-query capacity the round-9 verdict asked for.
  */
class BenchLineSpec extends AnyFunSuite {

  /** Worst-case synthetic roster: every key the widest real shape
    * ("qNNN"), every value 9.9 s — 2x the slowest real per-query min ever
    * recorded (q139 4.9 s) and the widest value that still prints in 3
    * chars. A >=10 s min would both be a perf regression worth failing on
    * AND is still caught by the runtime 1900-char guard; the spec budgets
    * for the world we actually operate in. */
  private def syntheticLine(n: Int): String = {
    // keys mirror the real roster's shapes exactly: q01..q99 then q100..
    val mins = (1 to n).map(i => f"q$i%02d_synthetic_name" -> 9.9)
    Bench.buildLine(mins, runsPerQuery = 3, failures = 0,
      sfDir = "/root/testdata/sf0.1")
  }

  test("160 worst-case queries fit the harness tail budget") {
    val line = syntheticLine(160)
    assert(line.length <= Bench.MaxLineChars,
      s"160-query worst-case line is ${line.length} chars (> ${Bench.MaxLineChars})")
  }

  test("the CURRENT roster fits with >=12 queries of worst-case headroom") {
    val mins = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 9.9)
    val line = Bench.buildLine(mins, 3, 0, "/root/testdata/sf0.1")
    // 11 chars ≈ one worst-case query entry; require a dozen of slack so
    // the NEXT round's additions can't sneak past the guard either
    assert(line.length + 12 * 11 <= Bench.MaxLineChars,
      s"roster line ${line.length} chars leaves <12 queries of headroom")
  }

  test("short qNN keys stay unique and values are 1-decimal") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.map(Bench.shortKey).distinct.size == names.size,
      "short qNN bench keys must stay unique")
    val line = Bench.buildLine(Seq("q01_agg" -> 1.234, "q02_x" -> 0.05), 3, 0, "sf")
    assert(line.contains("\"q01\":1.2") && line.contains("\"q02\":0.1"),
      s"unexpected value formatting in: $line")
  }
}
