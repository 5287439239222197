package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // the library's blessed install: custom functions + the opt-in
    // range-join rule + the maintenance-statement parser sugar
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}
