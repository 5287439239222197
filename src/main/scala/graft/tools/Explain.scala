package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted plan (and optionally run) a query.
  * Usage: runMain graft.tools.Explain <sfDir> <query> [run] */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    df.explain("formatted")
    if (args.length > 2 && args(2) == "run") {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[run $i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      df.collect()
      println("=== final adaptive plan ===")
      println(df.queryExecution.executedPlan.toString.take(20000))
    }
    spark.stop()
  }
}
