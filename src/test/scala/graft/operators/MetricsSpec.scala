package graft.operators

import graft.SparkSpec

class MetricsSpec extends SparkSpec {
  test("query execution listener records action durations") {
    val s = spark; import s.implicits._
    val m = Metrics.attach(s)
    Seq(1, 2, 3).toDF("x").collect()
    // listener events are async — poll briefly
    val deadline = System.currentTimeMillis() + 5000
    while (m.snapshot.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
    val e = m.snapshot
    assert(e.nonEmpty && e.head.durationMs >= 0 && e.head.error.isEmpty)
  }
}
