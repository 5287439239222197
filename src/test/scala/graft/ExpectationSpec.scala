package graft

import graft.quality._
import org.scalatest.funsuite.AnyFunSuite

class ExpectationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Some(10.0), "A"), (2L, Some(20.0), "B"),
      (3L, None, "A"), (4L, Some(999.0), "C"), (4L, Some(30.0), "Z"))
      .toDF("id", "x", "cat")
  }

  test("suite evaluates all expectations in one pass") {
    val suite = ExpectationSuite("t", Seq(
      ExpectNotNull("x"),
      ExpectBetween("x", 0, 100),
      ExpectInSet("cat", Seq("A", "B", "C")),
      ExpectUnique("id"),
      ExpectRowCountBetween(1, 100)))
    val report = suite.run(df).collect()
      .map(r => r.getString(1) -> ((r.getLong(3), r.getDouble(4)))).toMap

    assert(report("expect_not_null") == ((0L, 1.0)))     // 1 null
    assert(report("expect_between") == ((0L, 1.0)))      // 999 out of range
    assert(report("expect_in_set") == ((0L, 1.0)))       // Z not in set
    assert(report("expect_unique") == ((0L, 1.0)))       // id 4 duplicated
    assert(report("expect_row_count_between") == ((1L, 5.0)))
  }

  test("quarantine splits by row predicate") {
    val suite = ExpectationSuite("t", Seq(
      ExpectBetween("x", 0, 100), ExpectInSet("cat", Seq("A", "B", "C"))))
    val (valid, bad) = suite.quarantine(df)
    // nulls pass value expectations (GX semantics); 999 and Z fail
    assert(valid.count() == 3)
    assert(bad.count() == 2)
  }

  test("suite report matches between engines on real data") {
    val got = SparkEntry.queries("dq_suite")(spark, TestSpark.sf)
    assert(got.count() == 16)
  }

  test("mostly tolerance: fractional violations pass, strict fails") {
    val strict = ExpectationSuite("t", Seq(ExpectBetween("x", 0, 100)))
    val tolerant = ExpectationSuite("t", Seq(
      ExpectBetween("x", 0, 100, mostly = 0.75)))
    // df has 4 non-null x values, one violation (999) → GX denominator
    // is the non-null count: 1 ≤ (1-0.75)·4 — exactly at the boundary
    val sStrict = strict.run(df).collect().head.getLong(3)
    val sTol = tolerant.run(df).collect().head.getLong(3)
    assert(sStrict == 0L)
    assert(sTol == 1L)
    assertThrows[IllegalArgumentException] {
      ExpectBetween("x", 0, 100, mostly = 0.0)
    }
  }

  test("observed metrics ride along with an action and match the report") {
    val orders = Tables.orders(spark, TestSpark.sf)
    val suite = ExpectationSuite("orders", Seq(
      ExpectNotNull("o_orderkey"),
      ExpectBetween("o_totalprice", 0, 1e9),
      ExpectInSet("o_orderstatus", Seq("F", "O", "P"))))
    val (observedDf, obs) = suite.observe(orders)
    observedDf.write.format("noop").mode("overwrite").save() // one action
    val metrics = obs.get
    val report = suite.run(orders).collect()
      .map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(metrics("obs_0").asInstanceOf[Double] == report("expect_not_null"))
    assert(metrics("obs_1").asInstanceOf[Double] == report("expect_between"))
    assert(metrics("obs_2").asInstanceOf[Double] == report("expect_in_set"))
  }

  test("compound uniqueness excludes NULL-bearing tuples from both terms") {
    import spark.implicits._
    // (1,1) duplicated once; the two (2,NULL) rows are NOT duplicates
    // (unknown keys can't violate uniqueness) and must not count
    val df = Seq(
      (Some(1L), Some(1L)), (Some(1L), Some(1L)),
      (Some(2L), Option.empty[Long]), (Some(2L), Option.empty[Long]),
      (Some(3L), Some(4L)))
      .toDF("a", "b")
    val rep = graft.quality.ExpectationSuite("t",
      Seq(graft.quality.ExpectCompoundUnique(Seq("a", "b")))).run(df)
      .collect().head
    assert(rep.getAs[Double]("observed") == 1.0,
      s"expected exactly the one real duplicate, got $rep")
  }

  test("increasing: pairwise-lag violations with ties and duplicates") {
    import spark.implicits._
    // ordered by (o, v): v sequence = 5, 5, 5, 3, 7, 7
    //   o=1 has values 5 and 5 (duplicate pair), o=2 has 5, o=3 has 3
    //   (a drop), o=4 has 7 and 7 (duplicate pair)
    val df = Seq((1, 5.0), (1, 5.0), (2, 5.0), (3, 3.0), (4, 7.0), (4, 7.0))
      .toDF("o", "v")
    def obs(strictly: Boolean): (Long, Double) = {
      val r = ExpectationSuite("t",
        Seq(ExpectIncreasing("v", "o", strictly))).run(df).collect().head
      (r.getAs[Long]("success"), r.getAs[Double]("observed"))
    }
    // non-strict: only the 5 -> 3 drop violates
    assert(obs(strictly = false) == ((0L, 1.0)))
    // strict: the drop, plus every equal consecutive pair:
    //   (5,5) within o=1, (5,5) across o=1->o=2, (7,7) within o=4
    assert(obs(strictly = true) == ((0L, 4.0)))
  }

  test("increasing: sorted sequence passes, nulls excluded, mostly") {
    import spark.implicits._
    val sorted = Seq((1, Some(1.0)), (2, Some(2.0)), (3, None),
      (4, Some(2.0)), (5, Some(9.0))).toDF("o", "v")
    val ok = ExpectationSuite("t", Seq(ExpectIncreasing("v", "o")))
      .run(sorted).collect().head
    assert(ok.getAs[Long]("success") == 1L)
    assert(ok.getAs[Double]("observed") == 0.0)
    // one violation among 4 non-null values: mostly=0.75 tolerates it
    val dip = Seq((1, 1.0), (2, 5.0), (3, 4.0), (4, 9.0)).toDF("o", "v")
    val strict = ExpectationSuite("t", Seq(ExpectIncreasing("v", "o")))
      .run(dip).collect().head
    val tol = ExpectationSuite("t",
      Seq(ExpectIncreasing("v", "o", mostly = 0.75))).run(dip).collect().head
    assert(strict.getAs[Long]("success") == 0L)
    assert(tol.getAs[Long]("success") == 1L)
  }

  test("increasing mixes with aggregate expectations in one suite") {
    import spark.implicits._
    val df = Seq((1, 1.0), (2, 3.0), (3, 2.0)).toDF("o", "v")
    val rep = ExpectationSuite("t", Seq(
      ExpectMinBetween("v", 1, 1), ExpectMaxBetween("v", 3, 3),
      ExpectSumBetween("v", 6, 6), ExpectIncreasing("v", "o"),
      ExpectUnique("v"), ExpectMedianBetween("v", 2, 2)))
      .run(df).collect()
      .map(r => r.getString(1) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(rep("expect_min_between") == ((1L, 1.0)))
    assert(rep("expect_max_between") == ((1L, 3.0)))
    assert(rep("expect_sum_between") == ((1L, 6.0)))
    assert(rep("expect_increasing") == ((0L, 1.0)))
    assert(rep("expect_unique") == ((1L, 0.0)))
    assert(rep("expect_median_between") == ((1L, 2.0)))
  }

  test("observe refuses relational expectations with a named error") {
    val e = intercept[IllegalArgumentException] {
      ExpectationSuite("t", Seq(ExpectIncreasing("v", "o")))
        .observe(df)
    }
    assert(e.getMessage.contains("relational"))
  }

  test("runWithActions fires once per FAILED expectation, report unperturbed") {
    val suite = ExpectationSuite("t", Seq(
      ExpectNotNull("x"),                     // fails (1 null)
      ExpectInSet("cat", Seq("A", "B", "C")), // fails (Z)
      ExpectRowCountBetween(1, 100)))         // passes
    val fired = scala.collection.mutable.ArrayBuffer.empty[FailedExpectation]
    val report = suite.runWithActions(df)(fired += _)
    // exactly the two failures, with the report row's own values
    assert(fired.map(_.expName).sorted ===
      Seq("expect_in_set", "expect_not_null"))
    assert(fired.forall(_.tableName == "t"))
    // the returned report is identical to a plain run (hook observes,
    // never perturbs) — the dq oracle keys stay byte-stable
    val plain = suite.run(df).collect().map(_.toString).sorted.toSeq
    assert(report.collect().map(_.toString).sorted.toSeq === plain)
    // all-green suite: zero action calls
    var calls = 0
    ExpectationSuite("t", Seq(ExpectRowCountBetween(1, 100)))
      .runWithActions(df)(_ => calls += 1)
    assert(calls === 0)
    // a throwing action fails the run loudly
    intercept[IllegalStateException] {
      suite.runWithActions(df)(_ =>
        throw new IllegalStateException("notify failed"))
    }
  }

  test("GatedPipeline.runWithActions fires per failing expectation per gate") {
    import org.apache.spark.sql.DataFrame
    import graft.pipeline.{GatedPipeline, Pipeline, Stage}
    val suite = ExpectationSuite("t", Seq(
      ExpectBetween("x", 0, 100),             // fails (999)
      ExpectNotNull("id")))                   // passes
    val p = Pipeline("demo", Seq(Stage("clean")(identity[DataFrame])))
    val gated = GatedPipeline(p,
      Map("clean" -> (suite, Pipeline.Quarantine)))
    val fired = scala.collection.mutable.ArrayBuffer.empty[GatedPipeline.Alert]
    val (out, quarantined) = gated.runWithActions(df)(fired += _)
    assert(fired.map(a => (a.pipeline, a.stage, a.expName)) ===
      Seq(("demo", "clean", "expect_between")))
    assert(fired.head.policy === "Quarantine")
    // the data path is exactly run()'s
    val (out2, q2) = gated.run(df)
    assert(out.count() === out2.count())
    assert(quarantined.head._2.count() === q2.head._2.count())
  }
}
