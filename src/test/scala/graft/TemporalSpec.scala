package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("SCD2 intervals tile each user's history without overlap") {
    val rows = SparkEntry.queries("q_scd2")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    for ((user, ivs) <- rows.groupBy(_._1)) {
      val sorted = ivs.sortBy(_._3).toSeq
      // each interval ends at or after it starts; chain is contiguous
      assert(sorted.forall { case (_, _, from, to) => to >= from })
      for (Seq(a, b) <- sorted.sliding(2) if sorted.length > 1)
        assert(a._4 == b._3, s"user $user: gap between ${a._4} and ${b._3}")
      // exactly one open interval per user
      assert(sorted.count(_._4 == 253402300799L) == 1)
      // consecutive states differ (runs are compressed)
      for (Seq(a, b) <- sorted.sliding(2) if sorted.length > 1)
        assert(a._2 != b._2, s"user $user: uncompressed run of ${a._2}")
    }
  }

  test("streaks never exceed the user's distinct active days") {
    import spark.implicits._
    val streaks = SparkEntry.queries("q_streaks")(spark, TestSpark.sf)
    val days = Tables.events(spark, TestSpark.sf)
      .select($"user_id", to_date($"ts").as("day")).distinct()
      .groupBy($"user_id").agg(count(lit(1)).as("n_days"))
    val bad = streaks.join(days, "user_id")
      .filter($"max_streak" > $"n_days" || $"max_streak" < 1 ||
        $"n_streaks" > $"n_days").count()
    assert(bad == 0)
    assert(streaks.count() > 0)
  }
}
