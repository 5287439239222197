package graft.quality

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** JSON → [[ExpectationSuite]] loader for the canonical Great
  * Expectations suite artifact shape
  * (`{"expectation_suite_name": ..., "expectations":
  * [{"expectation_type": ..., "kwargs": {...}}, ...]}`).
  *
  * The reference treats the GX suite as a DEPLOYABLE JSON file copied
  * into the Airflow DAGs bucket (cf. /root/reference/aws_infrastructure/
  * airflow-setup.py:323-340 — the `dags/gx` copy loop): operators edit
  * checks without touching pipeline code. This loader closes the same
  * loop for the Spark engine — a config-authored suite parses into the
  * identical [[Expectation]] ADT the Scala-built suites use, so it
  * runs through the same single-pass aggregate, `observe`, and
  * quarantine machinery with no recompilation.
  *
  * Jackson does the parsing: it already ships on Spark's runtime
  * classpath (no new dependency), and suite files are KB-sized driver
  * artifacts — no reason to spin a Spark job to read config.
  *
  * Unknown expectation types and malformed kwargs FAIL the load
  * (IllegalArgumentException) rather than silently dropping a check —
  * a data-quality gate that quietly loses expectations is worse than
  * one that refuses to start.
  */
object SuiteConfig {

  /** Parse a GX-shaped suite JSON string. `table` falls back to the
    * suite name when no explicit table field is present. */
  def fromJson(json: String): ExpectationSuite = {
    val root = new ObjectMapper().readTree(json)
    val table = Option(root.get("table")).map(_.asText())
      .orElse(Option(root.get("expectation_suite_name")).map(_.asText()))
      .getOrElse(throw new IllegalArgumentException(
        "suite JSON needs 'table' or 'expectation_suite_name'"))
    val exps = Option(root.get("expectations"))
      .filter(_.isArray)
      .getOrElse(throw new IllegalArgumentException(
        "suite JSON needs an 'expectations' array"))
      .elements().asScala.map(parseExpectation).toSeq
    require(exps.nonEmpty, "suite JSON has an empty 'expectations' array")
    ExpectationSuite(table, exps)
  }

  /** Load a suite from a JSON file on any Hadoop-visible filesystem
    * path (local, HDFS, object store) — config artifacts live next to
    * the data in the reference deployment. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): ExpectationSuite = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try fromJson(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  private def parseExpectation(node: JsonNode): Expectation = {
    val tpe = req(node, "expectation_type").asText()
    val kw = Option(node.get("kwargs")).getOrElse(
      throw new IllegalArgumentException(s"$tpe: missing kwargs"))
    def column: String = req(kw, "column").asText()
    def dbl(f: String): Double = req(kw, f).asDouble()
    def lng(f: String): Long = req(kw, f).asLong()
    def mostly: Double =
      Option(kw.get("mostly")).map(_.asDouble()).getOrElse(1.0)
    tpe match {
      case "expect_column_values_to_not_be_null" =>
        ExpectNotNull(column, mostly)
      case "expect_column_values_to_be_between" =>
        ExpectBetween(column, dbl("min_value"), dbl("max_value"), mostly)
      case "expect_column_values_to_be_in_set" =>
        val vs = req(kw, "value_set")
        require(vs.isArray, s"$tpe: value_set must be an array")
        ExpectInSet(column, vs.elements().asScala.map(_.asText()).toSeq, mostly)
      case "expect_column_values_to_be_unique" =>
        ExpectUnique(column, mostly)
      case "expect_table_row_count_to_be_between" =>
        ExpectRowCountBetween(lng("min_value"), lng("max_value"))
      case "expect_column_mean_to_be_between" =>
        ExpectMeanBetween(column, dbl("min_value"), dbl("max_value"))
      case "expect_column_stdev_to_be_between" =>
        ExpectStddevBetween(column, dbl("min_value"), dbl("max_value"))
      case "expect_column_value_lengths_to_be_between" =>
        ExpectLengthsBetween(column, dbl("min_value").toInt,
          dbl("max_value").toInt, mostly)
      case "expect_column_values_to_match_regex" =>
        ExpectMatchRegex(column, req(kw, "regex").asText(), mostly)
      case "expect_column_pair_values_a_to_be_greater_than_b" =>
        ExpectPairGreater(req(kw, "column_A").asText(),
          req(kw, "column_B").asText(),
          Option(kw.get("or_equal")).exists(_.asBoolean()), mostly)
      case "expect_compound_columns_to_be_unique" =>
        val cols = req(kw, "column_list")
        require(cols.isArray, s"$tpe: column_list must be an array")
        ExpectCompoundUnique(
          cols.elements().asScala.map(_.asText()).toSeq, mostly)
      case "expect_column_median_to_be_between" =>
        ExpectMedianBetween(column, dbl("min_value"), dbl("max_value"))
      case "expect_column_quantile_to_be_between" =>
        ExpectQuantileBetween(column, dbl("quantile"),
          dbl("min_value"), dbl("max_value"))
      case "expect_column_min_to_be_between" =>
        ExpectMinBetween(column, dbl("min_value"), dbl("max_value"))
      case "expect_column_max_to_be_between" =>
        ExpectMaxBetween(column, dbl("min_value"), dbl("max_value"))
      case "expect_column_sum_to_be_between" =>
        ExpectSumBetween(column, dbl("min_value"), dbl("max_value"))
      case "expect_column_values_to_be_increasing" =>
        // a distributed table has no row order: the order column is a
        // REQUIRED kwarg here (GX's pandas backend inherits file order,
        // which does not exist under a shuffle)
        ExpectIncreasing(column, req(kw, "order_by").asText(),
          Option(kw.get("strictly")).exists(_.asBoolean()), mostly)
      case "expect_column_distinct_values_to_be_in_set" =>
        val vs = req(kw, "value_set")
        require(vs.isArray, s"$tpe: value_set must be an array")
        ExpectDistinctInSet(column,
          vs.elements().asScala.map(_.asText()).toSeq)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported expectation_type: $other")
    }
  }

  private def req(n: JsonNode, field: String): JsonNode =
    Option(n.get(field)).filterNot(_.isNull).getOrElse(
      throw new IllegalArgumentException(s"missing required field: $field"))
}
