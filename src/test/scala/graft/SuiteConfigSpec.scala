package graft

import graft.quality._
import org.scalatest.funsuite.AnyFunSuite

/** The GX-JSON suite loader: a config-authored suite must be
  * indistinguishable from the Scala-built one — same ADT, same
  * single-pass report — and malformed config must fail the load, not
  * drop checks. */
class SuiteConfigSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val ordersJson =
    """{
      |  "expectation_suite_name": "orders",
      |  "expectations": [
      |    {"expectation_type": "expect_column_values_to_not_be_null",
      |     "kwargs": {"column": "o_orderkey"}},
      |    {"expectation_type": "expect_column_values_to_not_be_null",
      |     "kwargs": {"column": "o_custkey"}},
      |    {"expectation_type": "expect_column_values_to_not_be_null",
      |     "kwargs": {"column": "o_totalprice"}},
      |    {"expectation_type": "expect_column_values_to_not_be_null",
      |     "kwargs": {"column": "o_orderdate"}},
      |    {"expectation_type": "expect_column_values_to_be_in_set",
      |     "kwargs": {"column": "o_orderstatus", "value_set": ["F", "O", "P"]}},
      |    {"expectation_type": "expect_column_values_to_be_in_set",
      |     "kwargs": {"column": "o_orderpriority",
      |       "value_set": ["1-URGENT", "2-HIGH", "3-MEDIUM",
      |                     "4-NOT SPECIFIED", "5-LOW"]}},
      |    {"expectation_type": "expect_column_values_to_be_unique",
      |     "kwargs": {"column": "o_orderkey"}},
      |    {"expectation_type": "expect_column_values_to_be_unique",
      |     "kwargs": {"column": "o_custkey"}}
      |  ]
      |}""".stripMargin

  test("JSON-loaded suite parses into the identical Expectation ADT") {
    val fromJson = SuiteConfig.fromJson(ordersJson)
    val built = ExpectationSuite("orders", Seq(
      ExpectNotNull("o_orderkey"), ExpectNotNull("o_custkey"),
      ExpectNotNull("o_totalprice"), ExpectNotNull("o_orderdate"),
      ExpectInSet("o_orderstatus", Seq("F", "O", "P")),
      ExpectInSet("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
      ExpectUnique("o_orderkey"), ExpectUnique("o_custkey")))
    assert(fromJson == built) // case-class equality: exact ADT match
  }

  test("JSON-loaded suite produces the identical report as the built one") {
    val fromJson = SuiteConfig.fromJson(
      """{"table": "lineitem", "expectations": [
        |  {"expectation_type": "expect_column_values_to_be_between",
        |   "kwargs": {"column": "l_quantity", "min_value": 1, "max_value": 50}},
        |  {"expectation_type": "expect_column_values_to_be_between",
        |   "kwargs": {"column": "l_extendedprice", "min_value": 0,
        |     "max_value": 100000, "mostly": 0.9}},
        |  {"expectation_type": "expect_column_mean_to_be_between",
        |   "kwargs": {"column": "l_discount", "min_value": 0, "max_value": 0.1}},
        |  {"expectation_type": "expect_column_value_lengths_to_be_between",
        |   "kwargs": {"column": "l_linestatus", "min_value": 1, "max_value": 1}},
        |  {"expectation_type": "expect_column_values_to_match_regex",
        |   "kwargs": {"column": "l_returnflag", "regex": "^[ARN]$"}},
        |  {"expectation_type": "expect_table_row_count_to_be_between",
        |   "kwargs": {"min_value": 1, "max_value": 1000000000}}
        |]}""".stripMargin)
    val built = ExpectationSuite("lineitem", Seq(
      ExpectBetween("l_quantity", 1, 50),
      ExpectBetween("l_extendedprice", 0, 100000, mostly = 0.9),
      ExpectMeanBetween("l_discount", 0, 0.1),
      ExpectLengthsBetween("l_linestatus", 1, 1),
      ExpectMatchRegex("l_returnflag", "^[ARN]$"),
      ExpectRowCountBetween(1L, 1000000000L)))
    val li = Tables.lineitem(spark, TestSpark.sf)
    val a = fromJson.run(li).collect().map(_.toString).sorted
    val b = built.run(li).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("suite file round-trips through the filesystem loader") {
    val f = java.nio.file.Files.createTempFile("suite", ".json")
    java.nio.file.Files.writeString(f, ordersJson)
    val loaded = SuiteConfig.load(spark, f.toString)
    assert(loaded == SuiteConfig.fromJson(ordersJson))
    java.nio.file.Files.delete(f)
  }

  test("unknown expectation types and malformed kwargs fail the load") {
    assertThrows[IllegalArgumentException] {
      SuiteConfig.fromJson(
        """{"table": "t", "expectations": [
          |  {"expectation_type": "expect_totally_made_up",
          |   "kwargs": {"column": "x"}}]}""".stripMargin)
    }
    assertThrows[IllegalArgumentException] { // between without bounds
      SuiteConfig.fromJson(
        """{"table": "t", "expectations": [
          |  {"expectation_type": "expect_column_values_to_be_between",
          |   "kwargs": {"column": "x"}}]}""".stripMargin)
    }
    assertThrows[IllegalArgumentException] { // no expectations
      SuiteConfig.fromJson("""{"table": "t", "expectations": []}""")
    }
    assertThrows[IllegalArgumentException] { // no suite name
      SuiteConfig.fromJson("""{"expectations": [
        |  {"expectation_type": "expect_column_values_to_be_unique",
        |   "kwargs": {"column": "x"}}]}""".stripMargin)
    }
  }

  test("extended GX families parse and reproduce the built report") {
    val fromJson = SuiteConfig.fromJson(
      """{"table": "lineitem", "expectations": [
        |  {"expectation_type": "expect_column_pair_values_a_to_be_greater_than_b",
        |   "kwargs": {"column_A": "l_extendedprice", "column_B": "l_discount"}},
        |  {"expectation_type": "expect_column_pair_values_a_to_be_greater_than_b",
        |   "kwargs": {"column_A": "l_tax", "column_B": "l_discount",
        |     "or_equal": true, "mostly": 0.4}},
        |  {"expectation_type": "expect_compound_columns_to_be_unique",
        |   "kwargs": {"column_list": ["l_orderkey", "l_linenumber"]}},
        |  {"expectation_type": "expect_column_median_to_be_between",
        |   "kwargs": {"column": "l_quantity", "min_value": 20, "max_value": 30}},
        |  {"expectation_type": "expect_column_quantile_to_be_between",
        |   "kwargs": {"column": "l_quantity", "quantile": 0.9,
        |     "min_value": 40, "max_value": 50}},
        |  {"expectation_type": "expect_column_distinct_values_to_be_in_set",
        |   "kwargs": {"column": "l_returnflag", "value_set": ["A", "R", "N"]}}
        |]}""".stripMargin)
    val built = ExpectationSuite("lineitem", Seq(
      ExpectPairGreater("l_extendedprice", "l_discount"),
      ExpectPairGreater("l_tax", "l_discount", orEqual = true, mostly = 0.4),
      ExpectCompoundUnique(Seq("l_orderkey", "l_linenumber")),
      ExpectMedianBetween("l_quantity", 20, 30),
      ExpectQuantileBetween("l_quantity", 0.9, 40, 50),
      ExpectDistinctInSet("l_returnflag", Seq("A", "R", "N"))))
    assert(fromJson == built)
    val li = Tables.lineitem(spark, TestSpark.sf)
    val report = fromJson.run(li).collect()
      .map(r => ((r.getAs[String]("exp_name"), r.getAs[String]("col_name")),
        r.getAs[Long]("success"))).toMap
    // the corpus REALLY contains duplicate (orderkey, linenumber)
    // pairs — the compound check must report the failure, the rest
    // must hold
    assert(report == Map(
      ("expect_pair_greater", "l_extendedprice,l_discount") -> 1L,
      ("expect_pair_greater", "l_tax,l_discount") -> 1L,
      ("expect_compound_unique", "l_orderkey,l_linenumber") -> 0L,
      ("expect_median_between", "l_quantity") -> 1L,
      ("expect_quantile_0.9_between", "l_quantity") -> 1L,
      ("expect_distinct_in_set", "l_returnflag") -> 1L), report.toString)
  }

  test("pair-greater quarantine keeps only rows where A > B") {
    val suite = ExpectationSuite("lineitem", Seq(
      ExpectPairGreater("l_extendedprice", "l_quantity")))
    val li = Tables.lineitem(spark, TestSpark.sf)
    val (valid, bad) = suite.quarantine(li)
    assert(valid.count() + bad.count() == li.count())
    import org.apache.spark.sql.functions._
    assert(valid.filter(col("l_extendedprice") <= col("l_quantity")).count() == 0)
  }

  test("mostly defaults to 1.0 when absent and parses when present") {
    val s = SuiteConfig.fromJson(
      """{"table": "t", "expectations": [
        |  {"expectation_type": "expect_column_values_to_not_be_null",
        |   "kwargs": {"column": "x"}},
        |  {"expectation_type": "expect_column_values_to_not_be_null",
        |   "kwargs": {"column": "y", "mostly": 0.95}}]}""".stripMargin)
    assert(s.expectations == Seq(
      ExpectNotNull("x", 1.0), ExpectNotNull("y", 0.95)))
  }

  test("min/max/sum/increasing long-tail types parse into the ADT") {
    val s = SuiteConfig.fromJson(
      """{"table": "t", "expectations": [
        |  {"expectation_type": "expect_column_min_to_be_between",
        |   "kwargs": {"column": "x", "min_value": 0, "max_value": 1}},
        |  {"expectation_type": "expect_column_max_to_be_between",
        |   "kwargs": {"column": "x", "min_value": 9, "max_value": 10}},
        |  {"expectation_type": "expect_column_sum_to_be_between",
        |   "kwargs": {"column": "x", "min_value": 0, "max_value": 100}},
        |  {"expectation_type": "expect_column_values_to_be_increasing",
        |   "kwargs": {"column": "x", "order_by": "ts"}},
        |  {"expectation_type": "expect_column_values_to_be_increasing",
        |   "kwargs": {"column": "x", "order_by": "ts", "strictly": true,
        |              "mostly": 0.9}}]}""".stripMargin)
    assert(s.expectations == Seq(
      ExpectMinBetween("x", 0, 1),
      ExpectMaxBetween("x", 9, 10),
      ExpectSumBetween("x", 0, 100),
      ExpectIncreasing("x", "ts"),
      ExpectIncreasing("x", "ts", strictly = true, mostly = 0.9)))
  }

  test("increasing without an order column fails the load") {
    val e = intercept[IllegalArgumentException] {
      SuiteConfig.fromJson(
        """{"table": "t", "expectations": [
          |  {"expectation_type": "expect_column_values_to_be_increasing",
          |   "kwargs": {"column": "x"}}]}""".stripMargin)
    }
    assert(e.getMessage.contains("order_by"))
  }
}
