package graft

import org.scalatest.funsuite.AnyFunSuite

/** The exact-vs-sketch 1% assertion for q_approx_quantile_sketch —
  * kept OUT of the benchmarked plan so Bench times only the sketch
  * (the round-3 finding: the old combined query paid the exact
  * percentile sort it claimed to avoid). */
class ApproxQuantileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sketch quantiles land within 1% of the exact per-group values") {
    val sketch = SparkEntry.queries("q_approx_quantile_sketch")(
      spark, TestSpark.sf).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val exact = SparkEntry.queries("q_percentile")(spark, TestSpark.sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(sketch.keySet == exact.keySet)
    def close(a: Double, e: Double): Boolean =
      math.abs(a - e) <= math.max(math.abs(e) * 0.01, 0.01)
    exact.foreach { case (g, (e25, e50, e75)) =>
      val (a25, a50, a75) = sketch(g)
      assert(close(a25, e25), s"$g p25: sketch $a25 vs exact $e25")
      assert(close(a50, e50), s"$g p50: sketch $a50 vs exact $e50")
      assert(close(a75, e75), s"$g p75: sketch $a75 vs exact $e75")
    }
  }

  test("verify-only exact+sketch query is excluded from Bench timing") {
    assert(SparkEntry.benchExclude.contains("q_approx_quantile"))
    assert(SparkEntry.queries.contains("q_approx_quantile"))
    assert(SparkEntry.queries.contains("q_approx_quantile_sketch"))
  }
}
