package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line of per-query seconds.
  *
  * Queries are materialized through the `noop` sink so the FULL plan
  * (projections included) executes — `count()` would let Catalyst
  * prune the very columns being benchmarked. A warmup pass absorbs
  * JVM/codegen compilation so per-query numbers measure the plans.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // optional args = bench only these queries (local dev loop)
    val only = args.toSet
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(SparkEntry.benchExclude)
      .filter(n => only.isEmpty || only(n))

    def loadavg: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(",")
      catch { case _: Throwable => "" }

    // Noise defense (round-3 lesson: with ZERO code change, per-query
    // times moved by a median 0.30× between rounds — host contention
    // is the dominant error term). One warmup pass absorbs Catalyst
    // analysis + codegen compile; then THREE timed passes per query,
    // reported as the min (the robust steady-state estimator under
    // one-sided noise). All per-pass times plus /proc/loadavg before
    // each pass land in the JSON so a reviewer can attribute any
    // outlier to load instead of guessing.
    names.foreach(materialize) // warmup
    val passLoad = Seq.newBuilder[String]
    val passes: Seq[Map[String, Double]] = (1 to 3).map { _ =>
      passLoad += loadavg
      names.map(n => n -> materialize(n)).toMap
    }
    val results = names.map { n =>
      val ts = passes.map(_(n)).filter(_ >= 0)
      n -> (if (ts.isEmpty) -1.0 else ts.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val perPass = names.map { n =>
      "\"" + n + "\":[" + passes.map(_(n)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val loads = passLoad.result().map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""passes":$perPass,"loadavg":$loads,"sf":"$sfDir"}"""
    println(json)
    // also persist to a file: the driver's log tail truncates long
    // lines, which cost round 1 most of its per-query numbers
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), json)
    spark.stop()
  }
}
