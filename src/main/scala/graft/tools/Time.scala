package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch timer: `runMain graft.tools.Time <sfDir> q1 q2 ...` —
  * warmup + 3 timed noop-sink passes per named query, min reported.
  * The single-query analog of Bench for iterating on one plan. */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val runs = (0 to 3).map { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $n%-24s min=${runs.tail.min}%.2f warm=${runs.head}%.2f")
    }
    spark.stop()
  }
}
