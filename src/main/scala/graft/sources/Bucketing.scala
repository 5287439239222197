package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: pre-shuffle data ONCE at write time so every
  * later equi-join / aggregation on the bucket key is co-located and
  * runs with NO exchange.
  *
  * This is the highest-leverage layout decision at 100 TB: a fact
  * table bucketed by its join key turns the daily fact-fact join from
  * a full two-sided shuffle into a zipped per-bucket merge. Both
  * sides must agree on (key, bucket count).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted table in the session catalog.
    * Bucket count should put one task's worth of data per bucket at
    * target scale (e.g. 100 TB / 2048 buckets ≈ 50 GB per bucket
    * before column pruning). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two tables bucketed on their join keys — planner emits
    * a SortMergeJoin with no ShuffleExchange on either side (asserted
    * in BucketingSpec). */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
