package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-loop profiler: run one named query and print per-job wall
  * times — the tool for hunting serial stage constants in multi-job
  * plans (the exact-percentile family). Not part of the driver
  * contract. Usage:
  *   sbt "runMain graft.tools.JobProbe <sfDir> <query> [passes]"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq // comma-separated = profile several in one JVM
    val passes = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = js.time
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val ms = je.time - starts.getOrElse(je.jobId, je.time)
        println(f"[job ${je.jobId}%3d] ${ms}%5d ms")
      }
    })
    for (name <- names) {
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      for (p <- 1 to passes) {
        println(s"=== pass $p: $name ===")
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      // clearCache too (r19 ADVICE): unpersisting RDDs leaves
      // CacheManager entries behind, so a later name whose plan
      // matches an earlier .cache()d relation would silently reuse
      // (and re-materialize) the InMemoryRelation, skewing multi-name
      // profiles vs single-name runs
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
