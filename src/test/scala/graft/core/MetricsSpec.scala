package graft.core

import graft.SparkSpec

class MetricsSpec extends SparkSpec {

  test("spill metrics listener accumulates stage metrics and formats a summary") {
    val m = SpillMetrics.register(spark)
    val spark2 = spark
    import spark2.implicits._
    (1 to 1000).toDF("x").groupBy($"x" % 7).count().collect()
    Thread.sleep(300) // listener events are delivered asynchronously
    assert(m.summary.startsWith("memory spill:"))
    assert(m.peakMem.get >= 0)
  }
}
