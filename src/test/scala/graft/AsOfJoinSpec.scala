package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("as-of join picks most recent reference row at or before probe ts") {
    import spark.implicits._
    val probes = Seq(
      (100L, 1L, 15L), // matches ref at 12
      (101L, 1L, 10L), // matches ref at 10 (equal ts eligible)
      (102L, 1L, 5L),  // no ref before -> null
      (103L, 2L, 50L)  // other key, matches 40
    ).toDF("event_id", "user_id", "ts")
    val refs = Seq(
      (1L, 1L, 10L), (2L, 1L, 12L), (3L, 2L, 40L), (4L, 2L, 60L))
      .toDF("event_id", "user_id", "ts")

    val out = AsOfJoin(probes, refs, "user_id", "ts", "event_id")
      .select("event_id", "asof_ts")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    assert(out(100L) == Some(12L))
    assert(out(101L) == Some(10L))
    assert(out(102L) == None)
    assert(out(103L) == Some(40L))
  }
}
