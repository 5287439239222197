package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles (percentile_cont / DuckDB
  * quantile_cont semantics) WITHOUT Spark's `percentile()` aggregate,
  * which buffers every value of a group in one reducer's hash map —
  * an OOM with few groups at 100 TB. Distributed SELECTION instead:
  *
  *   1. count per (group, value) — fully parallel, map-side
  *      combinable shuffle — then localCheckpoint the histogram so
  *      every later arm reads blocks, not lineage;
  *   2. range-bucket the distinct values (approximate per-group
  *      quantile boundaries — quality only affects balance, never
  *      the answer) and aggregate ONE count per (group, bucket);
  *   3. from the `groups × buckets`-row cumulative bucket counts
  *      (windowless self-join — no single-partition sort anywhere),
  *      keep ONLY the buckets that contain a requested rank
  *      (≤ 2·|fracs| buckets per group);
  *   4. rank-window just those buckets' rows (each ~1/buckets of the
  *      group's distinct values) and interpolate, identical to
  *      percentile_cont.
  *
  * vs the previous full-histogram rank pass: the per-row running sum
  * + offsets broadcast-join over EVERY distinct value is replaced by
  * a bucket-count aggregate plus a window over the few needed
  * buckets, so the ordered-pass work drops by ~buckets/(2·|fracs|)×.
  * At 1000 executors, pass a larger `buckets` so each needed bucket's
  * slice stays executor-sized.
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
    * the same histogram + bucket-selection machinery as [[perGroup]].
    * Callers should stick to binary-exact fractions (0.25, 0.5,
    * 0.75, ...) when an external engine must agree on the rank:
    * ceil(p·n) at a non-representable p can differ by one at
    * exact-integer boundaries. */
  def perGroupDisc(df: DataFrame, group: String, value: String,
      fracs: Seq[(String, Double)]): DataFrame = {
    val src = df.select(col(group), col(value).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val vals = src.groupBy(col(group), col("v")).agg(count(lit(1)).as("c"))
    discFromHistogram(vals, group, fracs)
  }

  /** [[perGroupDisc]] over a pre-built (group, value, weight)
    * histogram — the weighted-median family: the smallest value whose
    * cumulative weight reaches ceil(p·W) is exactly the discrete
    * percentile at rank ceil(p·W) of the weight-expanded multiset,
    * found by the same bucket-selection pass without ever expanding
    * the weights. `unique` as in [[perGroupWeighted]]. */
  def perGroupDiscWeighted(hist: DataFrame, group: String, value: String,
      weight: String, fracs: Seq[(String, Double)],
      unique: Boolean = false): DataFrame = {
    val src = hist
      .select(col(group), col(value).cast("double").as("v"),
        col(weight).cast("long").as("c"))
      .filter(col("v").isNotNull)
    discFromHistogram(src, group, fracs, materialized = unique)
  }

  private def discFromHistogram(vals: DataFrame, group: String,
      fracs: Seq[(String, Double)], materialized: Boolean = false): DataFrame = {
    require(fracs.nonEmpty)
    val ranked = rankNeededBuckets(vals, group,
      ranks = fracs.map { case (_, p) =>
        greatest(ceil(lit(p) * col("_n")), lit(1L)).cast("long").cast("double")
      }, materialized = materialized)
    val aggs = fracs.map { case (nm, p) =>
      val r = greatest(ceil(lit(p) * col("_n")), lit(1L)).cast("long")
      max(when(col("_lo") <= r && r <= col("_hi"), col("v"))).as(nm)
    }
    ranked.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
  }

  /** [[perGroup]] over a pre-built (group, value, weight) histogram,
    * for callers that already hold per-value counts — q_mad derives
    * its deviation histogram from the first round's value histogram
    * instead of rescanning and re-shuffling the raw table. Weights
    * are occurrence counts (each value row counts `weight` times).
    * Duplicate (group, value) rows (e.g. |v − med| collisions from
    * symmetric deviations) are EXACT without consolidation — the
    * selection pass's ROWS-frame rank spans stay disjoint and
    * contiguous across duplicates (see rankNeededBuckets) — so no
    * defensive re-group shuffle exists anywhere on this path.
    * `unique = true` means the caller's frame is already materialized
    * (checkpointed) or has shuffle-free lineage off one: the internal
    * checkpoint barrier is skipped and the few consumer arms
    * re-derive it from blocks (q_mad round 1 / q_outlier_iqr /
    * feat_winsorize checkpoint the histogram themselves; q_mad round
    * 2's deviation frame is a map-side projection off round 1's
    * blocks). Null values are skipped as in [[perGroup]]. */
  def perGroupWeighted(hist: DataFrame, group: String, value: String,
      weight: String, fracs: Seq[(String, Double)],
      unique: Boolean = false): DataFrame = {
    val src = hist
      .select(col(group), col(value).cast("double").as("v"),
        col(weight).cast("long").as("c"))
      .filter(col("v").isNotNull)
    fromHistogram(src, group, fracs, materialized = unique)
  }

  /** Core selection pass: `vals` is one row per (group, v) with
    * occurrence count `c`. Returns one row per group with a column
    * per fraction, percentile_cont interpolation. */
  private def fromHistogram(vals: DataFrame, group: String,
      fracs: Seq[(String, Double)], materialized: Boolean = false): DataFrame = {
    require(fracs.nonEmpty)
    def pos(p: Double): Column =
      lit(1.0) + lit(p) * (col("_n") - 1).cast("double")
    val ranked = rankNeededBuckets(vals, group,
      ranks = fracs.flatMap { case (_, p) =>
        Seq(floor(pos(p)),
          least(floor(pos(p)) + 1, col("_n").cast("double")))
      }, materialized = materialized)
    def pct(p: Double): Column = {
      val lo = floor(pos(p))
      val hi = least(lo + 1, col("_n").cast("double"))
      val vLo = max(when(col("_lo") <= lo && lo <= col("_hi"), col("v")))
      val vHi = max(when(col("_lo") <= hi && hi <= col("_hi"), col("v")))
      val frac = max(pos(p) - lo)
      vLo + frac * (vHi - vLo)
    }
    val aggs = fracs.map { case (nm, p) => pct(p).as(nm) }
    ranked.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
  }

  /** The shared bucket-selection pass. `ranks` are rank expressions
    * (1-based, as doubles) that may reference `_n` (the group's total
    * weight); only buckets containing at least one requested rank
    * survive to the rank window. Returns the needed buckets' rows
    * with `_lo`/`_hi` (the global rank span of each value) and `_n`.
    * Exactness never depends on the approximate bucket boundaries:
    * they only decide which few buckets hold the ranks. */
  private def rankNeededBuckets(vals: DataFrame, group: String,
      ranks: Seq[Column], materialized: Boolean = false): DataFrame = {
    // one materialization of the histogram; the bucket-count
    // aggregate and the needed-bucket join read its blocks instead of
    // recomputing the upstream shuffle (skipped when the caller
    // already checkpointed the frame it hands over)
    val hist = if (materialized) vals else vals.localCheckpoint(false)
    // GLOBAL bucket boundaries as plan literals: one tiny driver
    // collect (31 doubles off a 5% sample of the histogram blocks)
    // replaces the per-group bounds aggregate + broadcast join that
    // every consumer arm of `bucketed` re-executed — measured two
    // fewer jobs and one less join in both arms per percentile call.
    // Global (not per-group) boundaries only affect BALANCE, never
    // answers: a group occupying few buckets just rank-windows a
    // larger slice. The per-group variant stays in Rank.runningSums,
    // whose per-row window output is balance-critical; here only the
    // needed buckets (≤ 2·|fracs| per group) are ever windowed.
    val nBuckets = 32
    val fracs31 = (1 until nBuckets).map(_.toDouble / nBuckets)
    val sampled = hist.sample(0.05, 42L)
      .agg(percentile_approx(col("v").cast("double"),
        typedlit(fracs31), lit(128)))
      .head()
    val bucketed =
      if (sampled.isNullAt(0)) hist.withColumn("_bucket", lit(0))
      else {
        val bounds = sampled.getSeq[Double](0)
        hist.withColumn("_bucket",
          graft.functions.LowerBound(typedlit(bounds),
            col("v").cast("double")))
      }

    // groups × buckets rows: per-bucket weight totals
    val totals = bucketed.groupBy(col(group), col("_bucket"))
      .agg(sum(col("c")).as("_bc"))
    // exclusive prefix + grand total: pack each group's ≤`buckets`
    // (bucket, count) pairs into ONE sorted array and compute the
    // running offsets with codegen'd array HOFs — a single tiny
    // group-keyed aggregate instead of the former self-join + re-agg
    // chain (two fewer serial jobs per call; O(buckets²) fold work
    // per group, trivial at any scale since buckets is a constant)
    val cum = totals
      .groupBy(col(group))
      .agg(sort_array(collect_list(struct(col("_bucket"), col("_bc"))))
        .as("_l"))
      .withColumn("_n",
        aggregate(col("_l"), lit(0L), (a, x) => a + x.getField("_bc")))
      .select(col(group), col("_n"),
        explode(transform(col("_l"), (x, i) => struct(
          x.getField("_bucket").as("_bucket"),
          x.getField("_bc").as("_bc"),
          aggregate(slice(col("_l"), lit(1), i), lit(0L),
            (a, y) => a + y.getField("_bc")).as("_off")))).as("_x"))
      .select(col(group), col("_x._bucket").as("_bucket"),
        col("_x._bc").as("_bc"), col("_x._off").as("_off"), col("_n"))
    // a bucket is needed iff it contains some requested rank r:
    // _off < r ≤ _off + _bc
    val needCond = ranks.map { r =>
      col("_off").cast("double") < r &&
        r <= (col("_off") + col("_bc")).cast("double")
    }.reduce(_ || _)
    val needed = cum.filter(needCond)
      .select(col(group), col("_bucket"), col("_off"), col("_n"))

    // rank-window ONLY the needed buckets' rows; the bucket offset
    // lifts within-bucket running counts to global ranks. ROWS frame,
    // not the default RANGE: with RANGE, two rows carrying the SAME
    // (group, v) (a caller's unconsolidated histogram) are peers —
    // both read the full through-peer cumulative sum, so their
    // [_lo, _hi] spans overlap at the top and leave the bottom of the
    // combined span UNCOVERED (a rank falling there matches no row →
    // null percentile). Under ROWS each duplicate row gets a
    // contiguous disjoint slice of the combined span, every slice
    // labeled with the same v — any requested rank in the span finds
    // v, so duplicate value rows are EXACT by construction and
    // callers never need a defensive re-group shuffle. (Peer order
    // within equal v is tie-broken arbitrarily; every assignment
    // yields the same rank → value mapping.)
    val sub = bucketed.join(broadcast(needed), Seq(group, "_bucket"))
    val w = Window.partitionBy(col(group), col("_bucket"))
      .orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sub.withColumn("_hi", col("_off") + sum(col("c")).over(w))
      .withColumn("_lo", col("_hi") - col("c") + 1)
  }
}
