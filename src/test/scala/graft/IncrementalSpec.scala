package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("snapshot diff statuses are consistent with side presence") {
    val rows = SparkEntry.queries("q_snapshot_diff")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    for ((status, a, b) <- rows) status match {
      case "added"   => assert(a == 0.0 && b > 0.0)
      case "removed" => assert(a > 0.0 && b == 0.0)
      case "same"    => assert(a == b && a > 0.0)
      case "changed" => assert(a > 0.0 && b > 0.0 && a != b)
      case other     => fail(s"unexpected status $other")
    }
  }

  test("markov transition counts sum to events minus one per user") {
    import spark.implicits._
    val total = SparkEntry.queries("q_markov")(spark, TestSpark.sf)
      .agg(sum($"n")).head.getLong(0)
    val ev = Tables.events(spark, TestSpark.sf)
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(total == expected)
  }

  test("IQR outlier gate covers every row and bounds are ordered") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_outlier_iqr")(spark, TestSpark.sf).collect()
    val byFlag = Tables.lineitem(spark, TestSpark.sf)
      .groupBy($"l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == byFlag.keySet)
    for (r <- rows) {
      assert(r.getLong(2) == byFlag(r.getString(0))) // n = all rows of group
      assert(r.getLong(1) >= 0 && r.getLong(1) < r.getLong(2))
      assert(r.getDouble(3) < r.getDouble(4)) // lo_bound < hi_bound
    }
  }

  test("digit scrub masks every digit run") {
    import spark.implicits._
    val remaining = Tables.events(spark, TestSpark.sf)
      .select(regexp_replace($"props", "[0-9]+", "#").as("masked"))
      .filter($"masked".rlike("[0-9]")).count()
    assert(remaining == 0)
    val rows = SparkEntry.queries("q_scrub_digits")(spark, TestSpark.sf).collect()
    assert(rows.forall(_.getLong(3) > 0)) // chars_masked > 0 per type
  }

  test("centroids cover labels x dims and stay in the unit range") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val nLabels = emb.select($"label").distinct().count()
    val dim = emb.select(size($"embedding")).head.getInt(0)
    val cen = SparkEntry.queries("q_embed_centroid")(spark, TestSpark.sf)
    assert(cen.count() == nLabels * dim)
    assert(cen.filter(abs($"centroid") > 1.0).count() == 0)
  }

  test("array HOF norms are ~1 for L2-normalized embeddings") {
    val rows = SparkEntry.queries("q_array_hof")(spark, TestSpark.sf).collect()
    for (r <- rows) {
      assert(math.abs(r.getDouble(1) - 1.0) < 0.01, s"avg_norm ${r.getDouble(1)}")
      assert(r.getDouble(2) > 0 && r.getDouble(2) < 64)
    }
  }

  test("bounded top-k aggregator equals the window row_number form") {
    val agg = SparkEntry.queries("q_topk_agg")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val win = SparkEntry.queries("q_topk_per_group")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(agg.toSeq == win.toSeq && agg.nonEmpty)
  }

  test("repetition signals are valid ratios over every document") {
    import spark.implicits._
    val rep = SparkEntry.queries("text_repetition")(spark, TestSpark.sf)
    assert(rep.count() == Tables.documents(spark, TestSpark.sf).count())
    val bad = rep.filter($"distinct_ratio" <= 0 || $"distinct_ratio" > 1 ||
      $"top_tok_frac" <= 0 || $"top_tok_frac" > 1).count()
    assert(bad == 0)
  }
}
