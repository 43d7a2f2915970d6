package graft

import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite {
  import TestSpark._

  test("withMetrics captures scan and shuffle volume of the run") {
    val (nRows, m) = Metrics.withMetrics(spark) {
      SparkEntry.queries("q1_pricing_agg")(spark, sf).collect().length
    }
    assert(nRows > 0)
    assert(m.recordsRead > 0, s"expected scanned records, got $m")
    assert(m.bytesRead > 0, s"expected scanned bytes, got $m")
    assert(m.durationMs > 0)
  }

  test("a shuffle-free plan reports zero shuffle writes") {
    val (_, m) = Metrics.withMetrics(spark) {
      graft.sources.Tables.nation(spark, sf).collect().length
    }
    assert(m.shuffleBytesWritten == 0, s"plain scan must not shuffle: $m")
  }
}
