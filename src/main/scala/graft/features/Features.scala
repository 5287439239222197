package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering stages of the reference's taxi pipeline
  * (cf. /root/reference/source_data/train.parquet — `hour`,
  * `distance`, one-hot `vendor_*`/`pickup_*`/`dropoff_*` columns),
  * re-expressed as lazy DataFrame transforms.
  *
  * Scale notes: one-hot with an explicit category list is a pure
  * projection (no shuffle, codegen'd CASE WHEN per category);
  * auto-discovery does one distinct on the category column (cheap for
  * genuinely categorical data) and collects only the category values,
  * never rows. Scalers aggregate once and broadcast the 1-row stats
  * frame — no window-over-all-rows single-partition trap.
  */
object Encoders {
  def sanitize(v: String): String =
    v.toLowerCase.replaceAll("[^a-z0-9]+", "_")

  /** One-hot with an explicit category list — the 100 TB path. */
  def oneHot(df: DataFrame, column: String, categories: Seq[String],
      prefix: String): DataFrame =
    categories.foldLeft(df) { (acc, cat) =>
      acc.withColumn(s"${prefix}_${sanitize(cat)}",
        when(col(column) === cat, 1L).otherwise(0L))
    }

  /** One-hot discovering categories from the data (sorted for
    * determinism). Collects ONLY the distinct category values, and
    * only up to `maxCategories + 1` of them: pointing auto-discovery
    * at a high-cardinality column must fail fast with a clear error,
    * not OOM the driver (the classic one-hot foot-gun). */
  def oneHotAuto(df: DataFrame, column: String, prefix: String,
      maxCategories: Int = 1000): DataFrame = {
    val cats = df.select(column).distinct().limit(maxCategories + 1)
      .collect().map(_.getString(0)).sorted.toSeq
    require(cats.length <= maxCategories,
      s"one-hot discovery found > $maxCategories distinct values in " +
        s"'$column' — pass an explicit vocabulary or raise maxCategories")
    oneHot(df, column, cats, prefix)
  }
}

object TimeFeatures {
  /** Datetime decomposition (the reference's `hour` feature,
    * generalized). ISO day-of-week (Mon=1..Sun=7). */
  def expand(df: DataFrame, ts: String): DataFrame = df
    .withColumn("hour_of_day", hour(col(ts)).cast("long"))
    .withColumn("dow_iso", (weekday(col(ts)) + 1).cast("long"))
    .withColumn("month_num", month(col(ts)).cast("long"))
    .withColumn("day_num", dayofmonth(col(ts)).cast("long"))
}

object Scalers {
  /** Z-score: one aggregate pass + broadcast join of the 1-row stats. */
  def zscore(df: DataFrame, column: String, out: String): DataFrame = {
    val stats = df.agg(
      avg(col(column)).as("__mean"), stddev_samp(col(column)).as("__sd"))
    df.crossJoin(broadcast(stats))
      .withColumn(out, (col(column) - col("__mean")) / col("__sd"))
      .drop("__mean", "__sd")
  }

  /** Min-max scaling to [0,1], same broadcast-stats pattern. */
  def minmax(df: DataFrame, column: String, out: String): DataFrame = {
    val stats = df.agg(
      min(col(column)).as("__lo"), max(col(column)).as("__hi"))
    df.crossJoin(broadcast(stats))
      .withColumn(out, (col(column) - col("__lo")) / (col("__hi") - col("__lo")))
      .drop("__lo", "__hi")
  }

  /** Fixed-width binning (floor division — engine-portable). */
  def bucketize(df: DataFrame, column: String, width: Double,
      out: String): DataFrame =
    df.withColumn(out, floor(col(column) / width).cast("long"))
}

object Splits {
  /** Deterministic key-modulo split: reproducible across engines and
    * runs, unlike rand(). `testBucket` of `nBuckets` goes to test. */
  def byKeyModulo(df: DataFrame, key: String, nBuckets: Int = 5,
      testBucket: Int = 0, out: String = "split"): DataFrame =
    df.withColumn(out,
      when(col(key) % nBuckets === testBucket, "test").otherwise("train"))
}

object TargetEncoding {
  /** Per-category mean of the target, joined back (broadcast — the
    * category table is tiny by definition of categorical). */
  def encode(df: DataFrame, category: String, target: String,
      out: String): DataFrame = {
    val enc = df.groupBy(col(category))
      .agg(avg(col(target)).as(out))
    df.join(broadcast(enc), Seq(category))
  }
}
