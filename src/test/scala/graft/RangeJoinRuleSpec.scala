package graft

import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.catalyst.plans.logical.Generate
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The automatic keyless-range-join rewrite
  * ([[graft.plans.RangeJoinRule]]): fires on pure BETWEEN joins,
  * produces the bin-equi plan with identical results, and leaves
  * every join Spark can already hash untouched. Runs in its own
  * `newSession` so the installed optimizer rule never leaks into the
  * shared test session (PlanSpec asserts the NAIVE nested loop there). */
class RangeJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark.newSession()
    GraftFunctions.installRangeJoin(s, binWidth = 16)
    s
  }

  private def frames() = {
    import spark.implicits._
    val points = Seq.tabulate(300)(i => (i.toLong * 3 - 150, i))
      .toDF("p", "pid")
    val intervals = Seq.tabulate(40)(i =>
      (i.toLong * 17 - 160, i.toLong * 17 - 160 + (i % 29), i))
      .toDF("lo", "hi", "iid")
    (points, intervals)
  }

  private def expected(points: Seq[(Long, Int)],
      ivs: Seq[(Long, Long, Int)]): Seq[(Int, Int)] =
    (for {
      (p, pid) <- points
      (lo, hi, iid) <- ivs
      if p >= lo && p <= hi
    } yield (pid, iid)).sorted

  test("keyless BETWEEN join is rewritten to bin-equi, results exact") {
    import spark.implicits._
    val (points, intervals) = frames()
    val joined = points.join(intervals,
      $"p" >= $"lo" && $"p" <= $"hi")
    val opt = joined.queryExecution.optimizedPlan
    assert(opt.collect { case g: Generate => g }.nonEmpty,
      "rule did not fire: no bin explode in the optimized plan")
    assert(joined.queryExecution.sparkPlan.collect {
      case b: BroadcastNestedLoopJoinExec => b
    }.isEmpty, "nested loop survived the rewrite")
    val got = joined.select("pid", "iid").as[(Int, Int)]
      .collect().sorted.toSeq
    val want = expected(
      points.as[(Long, Int)].collect().toSeq,
      intervals.as[(Long, Long, Int)].collect().toSeq)
    assert(got == want)
    assert(joined.columns.toSeq == Seq("p", "pid", "lo", "hi", "iid"),
      "rewrite leaked its bin columns")
  }

  test("reversed bound orientation (lo <= p && hi >= p) fires too") {
    import spark.implicits._
    val (points, intervals) = frames()
    val joined = points.join(intervals,
      $"lo" <= $"p" && $"hi" >= $"p")
    assert(joined.queryExecution.optimizedPlan.collect {
      case g: Generate => g
    }.nonEmpty, "rule missed the bound-on-the-left spelling")
    assert(joined.queryExecution.sparkPlan.collect {
      case b: BroadcastNestedLoopJoinExec => b
    }.isEmpty, "nested loop survived the rewrite")
    val got = joined.select("pid", "iid").as[(Int, Int)]
      .collect().sorted.toSeq
    val want = expected(
      points.as[(Long, Int)].collect().toSeq,
      intervals.as[(Long, Long, Int)].collect().toSeq)
    assert(got == want)
  }

  test("rule is inert when the bin-width conf is unset or malformed") {
    import spark.implicits._
    val (points, intervals) = frames()
    def fires: Boolean = points.join(intervals,
        $"p" >= $"lo" && $"p" <= $"hi")
      .queryExecution.optimizedPlan.collect { case g: Generate => g }.nonEmpty
    val key = "spark.graft.rangeJoin.binWidth"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "not-a-number")
      assert(!fires, "malformed width must disable, not throw")
      spark.conf.unset(key)
      assert(!fires, "the rewrite is opt-in: unset width means inert")
    } finally spark.conf.set(key, saved)
    assert(fires, "restored width re-enables")
  }

  test("joins with an equi key are left alone") {
    import spark.implicits._
    val (points, intervals) = frames()
    val keyed = points.join(intervals,
      $"pid" === $"iid" && $"p" >= $"lo" && $"p" <= $"hi")
    assert(keyed.queryExecution.optimizedPlan.collect {
      case g: Generate => g
    }.isEmpty, "rule fired on a hashable join")
    // and strict bounds (not the >=/<= contract) also stay untouched
    val strict = points.join(intervals, $"p" > $"lo" && $"p" < $"hi")
    assert(strict.queryExecution.optimizedPlan.collect {
      case g: Generate => g
    }.isEmpty, "rule fired on strict bounds")
  }

  test("the shared test session is NOT affected by the install") {
    import TestSpark.spark.implicits._
    val s = TestSpark.spark
    val points = Seq((1L, 1)).toDF("p", "pid")
    val intervals = Seq((0L, 5L, 1)).toDF("lo", "hi", "iid")
    val joined = points.join(intervals,
      points("p") >= intervals("lo") && points("p") <= intervals("hi"))
    assert(joined.queryExecution.optimizedPlan.collect {
      case g: Generate => g
    }.isEmpty, "rule leaked into the shared session")
  }
}
