package graft.core

/** Hypervisor steal accounting around a measured region — the DIRECT
  * contention instrument behind bench protocol v4. `/proc/stat`'s `steal`
  * field counts ticks this guest's vCPUs sat RUNNABLE while the host ran
  * a neighbor: sampled before/after a region it measures contention
  * DURING that region — the integral evidence an out-of-band probe (a
  * scan sampled minutes away from the stage it adjudicates) cannot give.
  * Reported as the percentage of DEMANDED cpu denied:
  * `stealΔ / (userΔ + niceΔ + systemΔ + stealΔ)` — idle vCPUs accrue no
  * steal, so the ratio is over work the process actually asked for.
  * Returns -1 off-Linux or when `/proc/stat` is unreadable. Note what it
  * canNOT see: IO/memory-bandwidth contention (a fixed single-task scan's
  * absolute time is the instrument for that — PipelineBench prints one).
  */
object Steal {

  /** One /proc/stat cpu-summary sample (ticks): user, nice, system, idle,
    * iowait, irq, softirq, steal, ... — None off-Linux or unreadable. */
  def cpuTicks(): Option[Array[Long]] =
    scala.util.Try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
      finally src.close()
    }.toOption.filter(_.length >= 8)

  final class Meter {
    private val t0 = cpuTicks()
    /** Steal percentage of demanded cpu since construction. */
    def pct(): Double = (for (a <- t0; b <- cpuTicks()) yield {
      val d = b.zip(a).map { case (x, y) => x - y }
      val demanded = d(0) + d(1) + d(2) + d(7)
      if (demanded <= 0) 0.0 else 100.0 * d(7) / demanded
    }).getOrElse(-1.0)
  }
}
