package graft

import graft.operators.AsOfJoin
import graft.plans.{AsOfJoinExec, AsOfJoinNative}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native whole-plan AS-OF join (LogicalPlan + Strategy +
  * SparkPlan) against the union+window composition it replaces —
  * result equality on hand cases and on a real-sized randomized
  * frame, plus plan-shape assertions: the custom exec node is
  * present and each side pays exactly ONE exchange. */
class AsOfJoinNativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native as-of join matches the hand-checked semantics") {
    import spark.implicits._
    val probes = Seq(
      (100L, 1L, 15L), (101L, 1L, 10L), (102L, 1L, 5L), (103L, 2L, 50L)
    ).toDF("event_id", "user_id", "ts")
    val refs = Seq(
      (1L, 1L, 10L), (2L, 1L, 12L), (3L, 2L, 40L), (4L, 2L, 60L))
      .toDF("event_id", "user_id", "ts")
    val out = AsOfJoinNative(probes, refs, "user_id", "ts", "event_id")
      .select("event_id", "asof_ts")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(100L) == Some(12L))
    assert(out(101L) == Some(10L)) // equal ts eligible
    assert(out(102L) == None)      // no ref at or before → null
    assert(out(103L) == Some(40L))
  }

  test("native == union+window composition on a randomized event frame") {
    import spark.implicits._
    // deterministic pseudo-random probes/refs over 40 keys with ts
    // collisions (the tiebreak path) and keys missing on either side
    val probes = spark.range(0, 3000).select(
      $"id".as("event_id"),
      pmod(xxhash64($"id"), lit(40)).as("user_id"),
      pmod(xxhash64($"id" + 7), lit(500)).as("ts"))
    val refs = spark.range(10000, 12000).select(
      $"id".as("event_id"),
      pmod(xxhash64($"id"), lit(50)).as("user_id"), // some keys absent left
      pmod(xxhash64($"id" + 13), lit(500)).as("ts"),
      ($"id" % 97).cast("double").as("score"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id", $"asof_ts", $"asof_score")
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(1)), Option(r.get(2)))).toMap
    val native = norm(AsOfJoinNative(probes, refs,
      "user_id", "ts", "event_id", payload = Seq("score")))
    val composed = norm(AsOfJoin(probes, refs,
      "user_id", "ts", "event_id", payload = Seq("score")))
    assert(native.size == composed.size)
    assert(native == composed)
  }

  test("plan shape: custom exec present, one exchange per side") {
    import spark.implicits._
    val probes = Tables.events(spark, TestSpark.sf)
      .select($"event_id", $"user_id", $"ts")
    val refs = probes.withColumn("score", $"event_id" % 11)
    val df = AsOfJoinNative(probes, refs, "user_id", "ts", "event_id",
      payload = Seq("score"))
    // string-level assertions: under AQE the exec sits inside the
    // adaptive wrapper (collect() doesn't descend into it), and a
    // case class named *Exec prints with the suffix stripped
    val s = df.queryExecution.executedPlan.toString
    assert("(?m)^\\s*\\+- AsOfJoin ".r.findFirstIn(s).isDefined,
      s"custom exec missing:\n$s")
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(nExchanges == 2, s"expected 2 exchanges, got $nExchanges:\n$s")
    // and it actually runs
    assert(df.count() == probes.count())
  }
}
