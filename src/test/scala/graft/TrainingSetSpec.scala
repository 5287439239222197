package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Point-in-time correctness of the feature-store assembly: features
  * on a label row must be computable from events strictly before the
  * label — no future leakage, verified by brute-force recomputation. */
class TrainingSetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("assembled features equal brute-force strictly-before recompute") {
    val rows = SparkEntry.queries("pipe_training_set")(spark, TestSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    // brute force for a deterministic sample of 25 label rows
    for (r <- rows.sortBy(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("us"))).take(25)) {
      val (u, us) = (r.getAs[Long]("user_id"), r.getAs[Long]("us"))
      val before = ev.filter(e => e._1 == u && e._4 != "purchase" &&
        (e._3 < us || (e._3 == us))) // labels sort after equal-ts features
      val strictlyBefore = before.filter(_._3 <= us)
      val clicks = strictlyBefore.count(_._4 == "click")
      assert(r.getAs[Long]("n_clicks_before") == clicks,
        s"click count leak at user=$u us=$us")
      if (strictlyBefore.nonEmpty) {
        val lastVal = strictlyBefore.maxBy(e => (e._3, e._2))._5
        assert(math.abs(r.getAs[Double]("last_val") - lastVal) < 1e-3,
          s"last_val mismatch at user=$u us=$us")
      }
      val n7d = strictlyBefore.count(e => e._3 >= us - 7L * 86400 * 1000000)
      assert(r.getAs[Long]("n_7d") == n7d, s"7d count leak at user=$u us=$us")
    }
  }

  test("no label row carries features from its own future") {
    // a label at the very first event of a user must have zero
    // history: find such labels and assert empty features
    val df = SparkEntry.queries("pipe_training_set")(spark, TestSpark.sf)
    val firstEvents = Tables.events(spark, TestSpark.sf)
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("first_us"))
    val joined = df.join(firstEvents, "user_id")
      .filter(col("us") === col("first_us")).collect()
    joined.foreach { r =>
      assert(r.getAs[Long]("n_clicks_before") == 0L)
      assert(r.isNullAt(r.fieldIndex("last_val")))
    }
  }
}
