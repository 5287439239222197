package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant specs for the second analytics batch, the corpus-hygiene
  * text ops, and kNN classification (the oracle gate covers exact
  * values; these pin the semantic invariants that survive refactors).
  */
class Analytics2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("reservoir sample takes at most 5 per nation and is deterministic") {
    val a = SparkEntry.queries("q_reservoir_sample")(spark, TestSpark.sf).collect()
    val b = SparkEntry.queries("q_reservoir_sample")(spark, TestSpark.sf).collect()
    assert(a.sameElements(b))
    val perNation = a.groupBy(_.getInt(0))
    assert(perNation.values.forall(_.length <= 5))
    for (g <- perNation.values)
      assert(g.map(_.getInt(2)).sorted.sameElements(1 to g.length))
  }

  test("skyline points are mutually non-dominating and maximal") {
    val pts = SparkEntry.queries("q_skyline")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for (a <- pts; b <- pts if a != b)
      assert(!(b._1 >= a._1 && b._2 >= a._2),
        s"$a dominated by $b")
    // ordered by x asc → y must strictly decrease (else dominated)
    assert(pts.map(_._2).sliding(2).forall {
      case Array(y1, y2) => y2 < y1; case _ => true })
  }

  test("sweep-line concurrency is at least 1 and bounded by event count") {
    import spark.implicits._
    val conc = SparkEntry.queries("q_concurrency")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = Tables.events(spark, TestSpark.sf)
      .groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(conc.keySet == counts.keySet)
    for ((t, c) <- conc) {
      assert(c >= 1, s"$t concurrency $c")
      assert(c <= counts(t), s"$t concurrency $c > ${counts(t)} events")
    }
  }

  test("chi-square is non-negative with the expected degrees of freedom") {
    val r = SparkEntry.queries("q_chisq")(spark, TestSpark.sf).collect().head
    assert(r.getDouble(0) >= 0.0)
    assert(r.getLong(1) > 0)
  }

  test("moving median stays inside the trailing window's min/max") {
    val rows = SparkEntry.queries("q_median_window")(spark, TestSpark.sf)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val revs = rows.map(_._1)
    for (i <- rows.indices) {
      val win = revs.slice(math.max(0, i - 6), i + 1)
      assert(rows(i)._2 >= win.min - 1e-9 && rows(i)._2 <= win.max + 1e-9,
        s"row $i med ${rows(i)._2} outside [${win.min}, ${win.max}]")
    }
  }

  test("contamination ratio is in [0,1] and zero-overlap docs report 0") {
    val rows = SparkEntry.queries("text_contamination")(spark, TestSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, hit, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(hit <= n)
      assert(ratio >= 0.0 && ratio <= 1.0)
      if (hit == 0) assert(ratio == 0.0)
      assert(r.getLong(0) % 2 == 1, "only eval (odd) docs reported")
    }
  }

  test("packing bins cover every doc and only the last bin per source underfills") {
    import spark.implicits._
    val bins = SparkEntry.queries("text_pack")(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = Tables.documents(spark, TestSpark.sf).count()
    assert(bins.map(_._3).sum == nDocs, "every doc lands in exactly one bin")
    for ((src, group) <- bins.groupBy(_._1)) {
      val sorted = group.sortBy(_._2)
      // a bin b+1 only opens once the exclusive prefix sum reached
      // (b+1)·1000 tokens, so cumulative tokens through bin b must
      // cover the next bin id's threshold
      var cum = 0L
      for (Array((_, _, _, tok), (_, nextBin, _, _)) <- sorted.sliding(2)
           if sorted.length > 1) {
        cum += tok
        assert(cum >= nextBin * 1000,
          s"$src bin $nextBin opened before ${nextBin * 1000} tokens (cum $cum)")
      }
    }
  }

  test("kNN prediction labels come from the corpus label set") {
    import spark.implicits._
    val preds = SparkEntry.queries("sim_knn")(spark, TestSpark.sf).collect()
    assert(preds.length == 20)
    val labels = Tables.embeddings(spark, TestSpark.sf)
      .select($"label").distinct().collect().map(_.getInt(0).toLong).toSet
    for (p <- preds) {
      assert(labels.contains(p.getLong(1)))
      assert(p.getLong(2) >= 1 && p.getLong(2) <= 10)
    }
  }
}
