package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // A/B: shingle map-side cost — composable pipeline vs ShingleHashes
    val docs = Util.ensureParallelism(
      Tables.documents(spark, sfDir)).cache()
    docs.count()

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-12s min ${ts.min}%.3f  med ${ts.sorted.apply(2)}%.3f")
    }

    time("zip_with") {
      graft.text.TextAnalysis.shingleDocs(docs, "doc_id", "text", 5)
        .select(explode($"__shingles").as("sh"))
        .select(xxhash64($"sh").as("h"))
        .write.format("noop").mode("overwrite").save()
    }
    time("expr") {
      docs.select(explode_outer(
          graft.functions.ShingleHashes.of($"text", 5)).as("h"))
        .filter($"h".isNotNull)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
