package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only probe: run one query and print per-stage wall times and
  * job count — used to attribute the exact-percentile family's
  * stage-constant cost (round-12 item 4). Not part of the driver
  * contract. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("GRAFT_OPENCOST", "4194304"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int)]()
    val tasks = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.computeIfAbsent(t.stageId,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
          .add(t.taskInfo.duration)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.add((si.stageId, si.name.split(" ").head, ms, si.numTasks))
      }
    })

    for (name <- args) {
      // warmup
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      stages.clear(); tasks.clear(); jobs = 0
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      val ss = stages.toArray(Array.empty[(Int, String, Long, Int)]).sortBy(_._1)
      println(f"== $name%s total=$sec%.2fs jobs=$jobs stages=${ss.length}")
      ss.foreach { case (id, nm, ms, nt) =>
        val ds = Option(tasks.get(id)).map(_.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted).getOrElse(Array.empty[Long])
        val cpu = ds.sum
        val mx = if (ds.nonEmpty) ds.max else 0L
        println(f"   stage $id%3d $nm%-20s ${ms}%6d ms  $nt%3d tasks  taskSum=${cpu}%6d max=${mx}%6d")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
