package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch profiler: times labelled subplans of the percentile
  * family to attribute their fixed costs. Not part of the contract. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // per-job wall time attribution
    val jobs = scala.collection.mutable.Map.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs(js.jobId) = (System.nanoTime(),
            Option(js.properties.getProperty("spark.job.description"))
              .getOrElse("").take(60))
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs.get(je.jobId).foreach { case (t0, d) =>
            println(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s  $d")
          }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val run = si.taskMetrics.executorRunTime / 1e3
          val cpu = si.taskMetrics.executorCpuTime / 1e9
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield (c - s) / 1e3).getOrElse(-1.0)
          val rdds = si.rddInfos.map(_.name).filter(_ != null).mkString("|").take(120)
          println(f"[stage] ${si.stageId}%3d wall=$wall%6.2f run=$run%7.2f cpu=$cpu%7.2f tasks=${si.numTasks}%4d $rdds")
        }
      })

    def time(label: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[prof] $label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    def li = graft.Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_extendedprice")

    time("scan_count") { li.groupBy($"l_returnflag").count().collect() }
    time("approx_bounds") {
      li.groupBy($"l_returnflag")
        .agg(percentile_approx($"l_extendedprice",
          typedLit(Seq(0.25, 0.5, 0.75)), lit(128))).collect()
    }
    time("hist_groupby") {
      li.groupBy($"l_returnflag", $"l_extendedprice").count()
        .groupBy($"l_returnflag").count().collect()
    }
    time("full_perGroup") {
      graft.operators.ExactPercentile.perGroup(li,
        "l_returnflag", "l_extendedprice",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)).collect()
    }

    spark.stop()
  }
}
