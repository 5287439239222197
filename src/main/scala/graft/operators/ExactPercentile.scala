package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles (percentile_cont / DuckDB
  * quantile_cont semantics) WITHOUT Spark's `percentile()` aggregate,
  * which buffers every value of a group in one reducer's hash map —
  * an OOM with few groups at 100 TB. Instead:
  *
  *   1. count per (group, value) — fully parallel, map-side
  *      combinable shuffle;
  *   2. global running count + group total over the DISTINCT values
  *      of each group via [[Rank.runningSums]] — range-bucketed, so
  *      the ordered pass parallelizes across `buckets` tasks per
  *      group instead of ONE task per group (the grouping keys here
  *      are 3-4-value flags; a plain `Window.partitionBy(group)`
  *      would sort each group's whole value set on a single core);
  *   3. rank interpolation, identical to percentile_cont.
  */
object ExactPercentile {

  /** One row per group with an unrounded double column per requested
    * (name, fraction). Null values are skipped, matching
    * percentile_cont / quantile_cont. */
  def perGroup(df: DataFrame, group: String, value: String,
      fracs: Seq[(String, Double)]): DataFrame = {
    val src = df.select(col(group), col(value).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val vals = src.groupBy(col(group), col("v")).agg(count(lit(1)).as("c"))
    fromHistogram(vals, group, fracs)
  }

  /** Discrete percentiles (ANSI percentile_disc / DuckDB
    * quantile_disc): the ACTUAL value at rank ceil(p·n) — the
    * smallest value whose cume_dist ≥ p, no interpolation — through
    * the same histogram + range-bucketed rank machinery as
    * [[perGroup]]. Callers should stick to binary-exact fractions
    * (0.25, 0.5, 0.75, ...) when an external engine must agree on the
    * rank: ceil(p·n) at a non-representable p can differ by one at
    * exact-integer boundaries. */
  def perGroupDisc(df: DataFrame, group: String, value: String,
      fracs: Seq[(String, Double)]): DataFrame = {
    require(fracs.nonEmpty)
    val src = df.select(col(group), col(value).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val vals = src.groupBy(col(group), col("v")).agg(count(lit(1)).as("c"))
    val ranked = Rank
      .runningSums(vals, Seq(group), "v", Nil, Seq("hi" -> col("c")))
      .withColumn("lo", col("hi") - col("c") + 1)
      .withColumn("n", col("hi_total"))
    val aggs = fracs.map { case (nm, p) =>
      val r = greatest(ceil(lit(p) * col("n")), lit(1L)).cast("long")
      max(when(col("lo") <= r && r <= col("hi"), col("v"))).as(nm)
    }
    ranked.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
  }

  /** [[perGroup]] over a pre-built (group, value, weight) histogram,
    * for callers that already hold per-value counts — q_mad derives
    * its deviation histogram from the first round's value histogram
    * instead of rescanning and re-shuffling the raw table. Weights
    * are occurrence counts (each value row counts `weight` times).
    * Rows are re-grouped on (group, value) first, so duplicate value
    * rows (e.g. |v − med| collisions from symmetric deviations) are
    * safe; null values are skipped as in [[perGroup]]. */
  def perGroupWeighted(hist: DataFrame, group: String, value: String,
      weight: String, fracs: Seq[(String, Double)]): DataFrame = {
    val vals = hist
      .select(col(group), col(value).cast("double").as("v"),
        col(weight).cast("long").as("w"))
      .filter(col("v").isNotNull)
      .groupBy(col(group), col("v")).agg(sum(col("w")).as("c"))
    fromHistogram(vals, group, fracs)
  }

  private def fromHistogram(vals: DataFrame, group: String,
      fracs: Seq[(String, Double)]): DataFrame = {
    require(fracs.nonEmpty)
    val ranked = Rank
      .runningSums(vals, Seq(group), "v", Nil, Seq("hi_rank" -> col("c")))
      .withColumn("lo_rank", col("hi_rank") - col("c") + 1)
      .withColumn("n", col("hi_rank_total"))

    def pct(p: Double): Column = {
      val pos = lit(1.0) + lit(p) * (col("n") - 1).cast("double")
      val lo = floor(pos)
      val hi = least(lo + 1, col("n").cast("double"))
      val vLo = max(when(col("lo_rank") <= lo && lo <= col("hi_rank"), col("v")))
      val vHi = max(when(col("lo_rank") <= hi && hi <= col("hi_rank"), col("v")))
      val frac = max(pos - lo)
      vLo + frac * (vHi - vLo)
    }

    val aggs = fracs.map { case (nm, p) => pct(p).as(nm) }
    ranked.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
  }
}
