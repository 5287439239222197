package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wide-schema (722-column) volume probe for the vendor pipeline: the
  * reference's vendor parquet is fixed-size (~1k rows), so the wide
  * queries had plan-level assertions (scan pruning, codegen maxFields
  * behavior) but no volume datapoint. This replicates each vendor's
  * train/test split R× into a scratch datasets root (same layout, so
  * the listing-driven discovery finds it), points
  * `VendorPipeline.root` there via the `graft.vendor.root` property,
  * and times `pipe_vendor` (722→6 scan-pruned narrow fit) and
  * `pipe_vendor_onehot` (deliberately-wide 717-column aggregate) at
  * R and 10R. Linear-or-better growth = the wide plans hold under
  * volume, not just under planning assertions.
  *
  *   runMain graft.tools.VendorProbe [R]   (default 10, then ×10)
  */
object VendorProbe {
  def main(args: Array[String]): Unit = {
    val r0 = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val srcRoot = "/root/reference/source_data/datasets"
    val vendors = new java.io.File(srcRoot).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted

    def replicate(r: Int): String = {
      val dst = java.nio.file.Files
        .createTempDirectory(s"graft_vendor_x$r").toString
      for (v <- vendors; split <- Seq("train", "test")) {
        val src = spark.read.parquet(s"$srcRoot/$v/$split.parquet")
        val wide = src.crossJoin(
          spark.range(r).select(col("id").as("__rep")))
          .drop("__rep")
        wide.write.mode("overwrite").parquet(s"$dst/$v/$split.parquet")
      }
      dst
    }

    def timeIt(tag: String, name: String): Unit = {
      val runs = (0 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, "unused")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"VPROBE $tag%-24s min=${runs.tail.min}%.2f warm=${runs.head}%.2f")
    }

    // NOTE: VendorPipeline.root/vendors are lazy-memoized per JVM, so
    // each scale needs its own JVM — run this main once per R.
    val dir = replicate(r0)
    sys.props("graft.vendor.root") = dir
    val rows = spark.read.parquet(s"$dir/*/train.parquet").count()
    println(s"VPROBE replicated x$r0: $rows train rows at $dir")
    timeIt(s"pipe_vendor_x$r0", "pipe_vendor")
    timeIt(s"pipe_vendor_onehot_x$r0", "pipe_vendor_onehot")
    spark.stop()
  }
}
