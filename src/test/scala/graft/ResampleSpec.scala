package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bootstrap CI, decision stump, and duplicate-span invariants at
  * smoke scale. */
class ResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("bootstrap CI brackets the point mean and is ordered") {
    val r = run("q_bootstrap_ci").collect().head
    val (lo, mid, hi) = (r.getAs[Double]("ci_lo"),
      r.getAs[Double]("ci_mid"), r.getAs[Double]("ci_hi"))
    assert(lo < mid && mid < hi)
    assert(r.getAs[Long]("n_boot") == 100L)
    val trueMean = Tables.orders(spark, TestSpark.sf)
      .agg(avg(col("o_totalprice"))).collect().head.getDouble(0)
    assert(lo < trueMean && trueMean < hi,
      s"CI [$lo, $hi] misses the point mean $trueMean")
  }

  test("stump sides partition the table and gini is a valid impurity") {
    val r = run("ml_stump").collect().head
    val o = Tables.orders(spark, TestSpark.sf)
    assert(r.getAs[Long]("nl") + r.getAs[Long]("nr") == o.count())
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").count()
    assert(r.getAs[Long]("posl") + r.getAs[Long]("posr") == urgent)
    val g = r.getAs[Double]("gini")
    assert(g >= 0.0 && g <= 0.5)
  }

  test("duplicate-span fractions are consistent and a dup exists") {
    val rows = run("text_dup_spans").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val (n, d) = (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup"))
      d >= 0 && d <= n
    })
    assert(rows.forall { r =>
      val f = r.getAs[Double]("dup_frac"); f >= 0.0 && f <= 1.0 })
    // the synthetic corpus draws from a tiny vocabulary, so some
    // 8-gram MUST repeat across documents — if none do, the
    // fingerprint join is broken
    assert(rows.exists(_.getAs[Long]("n_dup") > 0))
  }

  test("bootstrap shuffle carries replicate-sized partials, not rows") {
    // the replicate aggregation must partial-aggregate map-side: the
    // exchange hashes on rep (B distinct keys), so each map task emits
    // at most B rows
    val df = run("q_bootstrap_ci")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      s"no map-side combine before the replicate shuffle:\n${p.take(3000)}")
  }
}
