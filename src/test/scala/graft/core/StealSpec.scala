package graft.core

import org.scalatest.funsuite.AnyFunSuite

class StealSpec extends AnyFunSuite {

  test("cpuTicks parses the /proc/stat summary on Linux") {
    // the suite only runs on the Linux bench box; the Option contract
    // (None off-Linux) is the code path, not this environment
    val ticks = Steal.cpuTicks()
    assert(ticks.isDefined)
    val t = ticks.get
    assert(t.length >= 8)
    assert(t.forall(_ >= 0L), t.mkString(","))
    // monotone on the fields Meter actually uses (user, nice, system,
    // steal — indices 0,1,2,7). proc(5): iowait (index 4) "is not
    // reliable" and CAN decrease on SMP kernels; asserting all fields
    // makes this gate flaky on the bench box.
    val t2 = Steal.cpuTicks().get
    for (i <- Seq(0, 1, 2, 7))
      assert(t2(i) >= t(i), s"field $i went backwards: ${t(i)} -> ${t2(i)}")
  }

  test("Meter.pct is a percentage of demanded cpu, stable under idle") {
    val m = new Steal.Meter
    // burn a little cpu so `demanded` is nonzero and the ratio defined
    var x = 0L
    val stop = System.nanoTime() + 200000000L
    while (System.nanoTime() < stop) x += 1
    val p = m.pct()
    assert(x > 0)
    // -1 is the documented unreadable sentinel; otherwise a percentage
    assert(p == -1.0 || (p >= 0.0 && p <= 100.0), s"pct=$p")
  }
}
