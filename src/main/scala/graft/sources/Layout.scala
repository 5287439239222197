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

  /** Z-order (Morton-curve) layout over TWO numeric columns — the
    * multi-dimensional generalization of [[writeRangeSorted]], the
    * same technique lakehouse OPTIMIZE ZORDER runs: each column is
    * rank-bucketed into 2^8 approximate-quantile buckets (ONE tiny
    * stats pass, broadcast — quantile buckets, not value ranges, so
    * skew cannot collapse the curve), the two 8-bit bucket ids are
    * bit-interleaved into a 16-bit Morton code, and the frame is
    * range-partitioned and sorted on that code before writing.
    *
    * Every output file then covers a small RECTANGLE of (a, b) space,
    * so parquet footer min/max stats skip files for a narrow
    * predicate on EITHER column — where a single-key sort serves only
    * its own key. One range exchange at write time, like every other
    * layout op here.
    *
    * NULLs in either column route to the TOP bucket (255), so null
    * rows cluster together at the tail of the curve instead of
    * silently sharing files with the lowest values (parquet stats
    * track nullCount separately, so those files still skip cleanly
    * for value predicates). Helper columns carry a `__graft_zo`
    * prefix and collisions with input columns are rejected up front. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      files: Int, path: String): Unit = {
    val (zdf, helpers, z) = withMortonCode(df, colA, colB)
    zdf.repartitionByRange(files, col(z))
      .sortWithinPartitions(col(z))
      .drop(helpers: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** The Morton-code construction [[writeZOrdered]] clusters on,
    * exposed so [[TxTable.overwriteZordered]] can apply the identical
    * curve to a transactional table. Returns (augmented frame, helper
    * columns to drop after clustering, morton column name). */
  private[sources] def withMortonCode(df: DataFrame, colA: String,
      colB: String): (DataFrame, Seq[String], String) = {
    val Seq(ba, bb, za, zb, z) =
      Seq("_ba", "_bb", "_za", "_zb", "_z").map("__graft_zo" + _)
    require(!df.columns.exists(_.startsWith("__graft_zo")),
      "z-order: input columns may not start with __graft_zo")
    val buckets = 1 << 8
    val fracs = (1 until buckets).map(_.toDouble / buckets)
    val bounds = df.agg(
      percentile_approx(col(colA).cast("double"), typedLit(fracs), lit(256))
        .as(ba),
      percentile_approx(col(colB).cast("double"), typedLit(fracs), lit(256))
        .as(bb))
    def bucketOf(c: String, b: String) =
      when(col(c).isNull, lit(buckets - 1))
        .otherwise(size(filter(col(b), x => x < col(c).cast("double"))))
    val morton = (0 until 8).map { i =>
      shiftleft(shiftright(col(za), i).bitwiseAND(lit(1)), 2 * i + 1)
        .bitwiseOR(
          shiftleft(shiftright(col(zb), i).bitwiseAND(lit(1)), 2 * i))
    }.reduce(_ bitwiseOR _)
    val zdf = df.crossJoin(broadcast(bounds))
      .withColumn(za, bucketOf(colA, ba))
      .withColumn(zb, bucketOf(colB, bb))
      .withColumn(z, morton)
    (zdf, Seq(ba, bb, za, zb, z), z)
  }
}
