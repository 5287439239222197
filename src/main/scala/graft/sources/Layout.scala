package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators — the write-side half of 100 TB performance.
  *
  * [[writeRangeSorted]] range-partitions on a sort key and sorts
  * within partitions before writing, so every parquet file covers a
  * disjoint key range: any range predicate then skips whole files via
  * footer min/max stats (and whole row groups inside surviving
  * files). The companion of [[Bucketing]] — bucketing co-locates
  * equi-join keys, range layout serves time-range scans.
  *
  * [[compact]] rewrites a directory of small files into `targetFiles`
  * — the nightly job that keeps streaming sinks (one file per
  * micro-batch per partition) from poisoning scan parallelism with
  * tiny files.
  */
object Layout {

  /** Range-partition by `sortCol` into `files` output files, sorted
    * within each, and write parquet. One range-exchange shuffle at
    * write time buys min/max file skipping on every later read. */
  def writeRangeSorted(df: DataFrame, sortCol: String, files: Int,
      path: String): Unit =
    df.repartitionByRange(files, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(path)

  /** Rewrite `path` into `targetFiles` parquet files. Uses coalesce
    * (no shuffle) — partition merge only, safe for compaction where
    * output order inside a file is irrelevant. */
  def compact(spark: SparkSession, path: String, targetFiles: Int,
      out: String): Unit =
    spark.read.parquet(path).coalesce(targetFiles)
      .write.mode("overwrite").parquet(out)
}
