package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed rank / running-total primitive.
  *
  * `sum(w).over(Window.orderBy(v))` — and every operator built on it:
  * row_number, ntile, ECDF sweeps, rank interpolation — plans as ONE
  * task holding every row when the partition spec is empty or has a
  * handful of distinct keys (`l_returnflag` has 3). Fine at sf0.1,
  * fatal at 100 TB: the whole table sorts on a single core.
  *
  * This primitive computes the same running totals with bounded
  * parallelism instead:
  *
  *   1. bucket each row by range: boundaries are approximate per-group
  *      quantiles of the order value (one small extra aggregate whose
  *      shuffle is reused from the caller's pre-aggregation when both
  *      consume the same child). Equal values always land in the same
  *      bucket, so RANGE-frame peer groups are never split and the
  *      results are EXACT — boundary quality only affects balance.
  *   2. running sums within each (group, bucket) — a window over
  *      `buckets`× more partitions than the naive plan, all parallel;
  *   3. cross-bucket offsets from a per-(group, bucket) total — a
  *      `groups × buckets`-row aggregate, windowed at that tiny size
  *      and broadcast-joined back.
  *
  * Exactness does NOT depend on the approximate boundaries: ranks are
  * reconstructed from exact per-bucket prefix sums, so a skewed
  * boundary set merely unbalances tasks.
  */
object Rank {

  /** Adds, for every `(name, weight)` in `sums`:
    *   - `name`: running total of `weight` over rows ordered by
    *     (`value`, `tie`*) within `group` — identical semantics to
    *     `sum(weight).over(Window.partitionBy(group*).orderBy(value, tie*))`
    *     including RANGE-frame peer handling when `tie` is empty;
    *   - `name_total`: the per-group grand total (the value an
    *     unordered full-frame window would give).
    *
    * `value` must be numeric (it feeds `percentile_approx`) and
    * non-null; callers filter nulls first. With `tie` columns forming
    * a unique key and `weight = lit(1L)`, `name` is `row_number()`.
    *
    * `buckets` bounds the parallelism recovered: each bucket sorts
    * independently, so size it near the cluster's task slots. 32
    * matches the local[32] harness; at 1000 executors you'd pass
    * `spark.sql.shuffle.partitions`.
    */
  def runningSums(df: DataFrame, group: Seq[String], value: String,
      tie: Seq[String], sums: Seq[(String, Column)],
      buckets: Int = 32): DataFrame = {
    require(sums.nonEmpty)
    val keep = df.columns.toSeq
    val weighted = sums.foldLeft(df) { case (d, (n, w)) =>
      d.withColumn(s"_w_$n", w)
    }
    // lazy localCheckpoint (no job until the caller's action): the
    // bucketed frame feeds the window arm, the totals arm, and the
    // offsets self-join — materializing it once truncates a 6×
    // duplicated static subtree (per-run Catalyst analysis is linear
    // in tree size) and replaces AQE stage-reuse recomputes with
    // block reads. Blocks are freed by the ContextCleaner when the
    // plan is dropped (same reasoning as the dedup pipelines).
    val bucketed = withRangeBucket(weighted, group, value, buckets)
      .localCheckpoint(false)

    val bucketKey = group :+ "_bucket"
    val wLocal = Window.partitionBy(bucketKey.map(col): _*)
      .orderBy((value +: tie).map(col): _*)
    val local = sums.foldLeft(bucketed) { case (d, (n, _)) =>
      d.withColumn(s"_loc_$n", sum(col(s"_w_$n")).over(wLocal))
    }

    // `groups × buckets` rows: exclusive prefix sums give each bucket
    // its offset, the within-group sum the grand total. Computed as a
    // within-group self-join + conditional aggregation (≤ buckets²
    // rows) so NO window node exists anywhere in the plan — even a
    // tiny `Window.orderBy` would show up as a single-partition sort.
    val totAggs = sums.map { case (n, _) => sum(col(s"_w_$n")).as(s"_tot_$n") }
    val totals = bucketed.groupBy(bucketKey.map(col): _*)
      .agg(totAggs.head, totAggs.tail: _*)
    val rhs = totals.select(
      (group.map(c => col(c).as(s"_r_$c")) :+ col("_bucket").as("_r_bucket")) ++
        sums.map { case (n, _) => col(s"_tot_$n").as(s"_rtot_$n") }: _*)
    val paired =
      if (group.isEmpty) totals.crossJoin(rhs)
      else totals.join(rhs,
        group.map(c => col(c) === col(s"_r_$c")).reduce(_ && _))
    val offAggs = sums.flatMap { case (n, _) => Seq(
      sum(when(col("_r_bucket") < col("_bucket"), col(s"_rtot_$n"))
        .otherwise(lit(0))).as(s"_off_$n"),
      sum(col(s"_rtot_$n")).as(s"_ntot_$n"))
    }
    val offsets = paired.groupBy(bucketKey.map(col): _*)
      .agg(offAggs.head, offAggs.tail: _*)

    val joined = local.join(broadcast(offsets), bucketKey)
    val finalCols = keep.map(col) ++ sums.flatMap { case (n, _) =>
      Seq((col(s"_off_$n") + col(s"_loc_$n")).as(n),
        col(s"_ntot_$n").as(s"${n}_total"))
    }
    joined.select(finalCols: _*)
  }

  /** Aggregate-only sibling of [[runningSums]] for callers whose
    * answer is a SUM OF rank products, not per-row ranks (ROC AUC via
    * the Mann-Whitney identity, the U statistic itself): for a
    * `(group, value)`-keyed histogram it returns, per group,
    *
    *   - each `(name, a, b)` in `dots`:
    *     `name = Σ_v a(v) · (Σ_{u<v} b(u))` — the dot product of `a`
    *     with the EXCLUSIVE running sum of `b` in `value` order;
    *   - each `(name, w)` in `totals`: the plain `Σ_v w(v)`.
    *
    * Same range-bucket decomposition as [[runningSums]] (exact for
    * any boundary quality: within-bucket windows are exact, and the
    * cross-bucket term `Σ_bkt a_tot(bkt) · Σ_{b'<bkt} b_tot(b')`
    * comes from a buckets²-row windowless self-join), but the dot
    * products collapse into per-bucket aggregates, so there is no
    * per-row rank column, no offsets broadcast-join back onto the
    * histogram, and no second full pass over it — two fewer stages
    * for a one-row answer. `df` must have one row per (group, value).
    */
  def prefixDotSums(df: DataFrame, group: Seq[String], value: String,
      dots: Seq[(String, Column, Column)], totals: Seq[(String, Column)],
      buckets: Int = 32): DataFrame = {
    require(dots.nonEmpty)
    val weighted0 = dots.foldLeft(df) { case (d, (n, a, b)) =>
      d.withColumn(s"_a_$n", a).withColumn(s"_b_$n", b)
    }
    val weighted = totals.foldLeft(weighted0) { case (d, (n, w)) =>
      d.withColumn(s"_t_$n", w)
    }
    // one lazy materialization feeds the window arm and the bounds
    // aggregate (same duplicated-subtree reasoning as runningSums)
    val bucketed = withRangeBucket(weighted, group, value, buckets)
      .localCheckpoint(false)
    prefixDotSumsBody(bucketed, group, value, dots, totals)
  }

  /** [[prefixDotSums]] with LITERAL bucket bounds and a single-lineage
    * plan — the ExactPercentile r14 treatment, for callers whose
    * histogram would otherwise be scanned three times (bounds
    * aggregate, checkpoint, window arm):
    *
    *   - `bounds` arrive as plan literals (the caller samples its RAW
    *     source, which is usually a cheap pruned scan — global, not
    *     per-group: boundaries only affect BALANCE, never answers);
    *   - the cross-bucket offsets come from packing each group's
    *     ≤`buckets` per-bucket partials into ONE sorted array and
    *     folding with codegen'd HOFs (O(buckets²) per group, constant)
    *     instead of the self-join + re-agg chain — so the histogram
    *     has exactly ONE consumer and needs NO checkpoint.
    *
    * All dot/total columns must be DOUBLE-valued (the HOF
    * accumulators are doubles). */
  def prefixDotSumsLit(df: DataFrame, group: Seq[String], value: String,
      dots: Seq[(String, Column, Column)], totals: Seq[(String, Column)],
      bounds: Seq[Double]): DataFrame = {
    require(dots.nonEmpty)
    val weighted0 = dots.foldLeft(df) { case (d, (n, a, b)) =>
      d.withColumn(s"_a_$n", a).withColumn(s"_b_$n", b)
    }
    val weighted = totals.foldLeft(weighted0) { case (d, (n, w)) =>
      d.withColumn(s"_t_$n", w)
    }
    val bucketed =
      if (bounds.isEmpty) weighted.withColumn("_bucket", lit(0))
      else weighted.withColumn("_bucket",
        graft.functions.LowerBound(typedlit(bounds),
          col(value).cast("double")))
    val bucketKey = group :+ "_bucket"
    val wPrev = Window.partitionBy(bucketKey.map(col): _*)
      .orderBy(col(value)).rowsBetween(Window.unboundedPreceding, -1)
    val local = dots.foldLeft(bucketed) { case (d, (n, _, _)) =>
      d.withColumn(s"_p_$n",
        coalesce(sum(col(s"_b_$n")).over(wPrev), lit(0.0)))
    }
    val perBucketAggs =
      dots.flatMap { case (n, _, _) => Seq(
        sum(col(s"_a_$n") * col(s"_p_$n")).as(s"_in_$n"),
        sum(col(s"_a_$n")).as(s"_atot_$n"),
        sum(col(s"_b_$n")).as(s"_btot_$n"))
      } ++ totals.map { case (n, _) => sum(col(s"_t_$n")).as(s"_ttot_$n") }
    val perBucket = local.groupBy(bucketKey.map(col): _*)
      .agg(perBucketAggs.head, perBucketAggs.tail: _*)
    // pack the group's buckets into one _bucket-sorted array; the
    // below-offset of bucket i is a slice-prefix fold — no self-join,
    // no second consumer of anything row-scale
    val fields = struct((col("_bucket") +:
      (dots.flatMap { case (n, _, _) =>
        Seq(col(s"_in_$n"), col(s"_atot_$n"), col(s"_btot_$n")) } ++
        totals.map { case (n, _) => col(s"_ttot_$n") }).map(c => c)): _*)
    val packedBase = perBucket.withColumn("_s", fields)
    val packed =
      if (group.isEmpty)
        packedBase.agg(sort_array(collect_list(col("_s"))).as("_l"))
      else packedBase.groupBy(group.map(col): _*)
        .agg(sort_array(collect_list(col("_s"))).as("_l"))
    val finalCols =
      dots.map { case (n, _, _) =>
        aggregate(
          transform(col("_l"), (x, i) =>
            x.getField(s"_in_$n") + x.getField(s"_atot_$n") *
              aggregate(slice(col("_l"), lit(1), i), lit(0.0),
                (a, y) => a + y.getField(s"_btot_$n"))),
          lit(0.0), (a, v) => a + v).as(n)
      } ++ totals.map { case (n, _) =>
        aggregate(col("_l"), lit(0.0),
          (a, x) => a + x.getField(s"_ttot_$n")).as(n)
      }
    packed.select(group.map(col) ++ finalCols: _*)
  }

  private def prefixDotSumsBody(bucketed: DataFrame, group: Seq[String],
      value: String, dots: Seq[(String, Column, Column)],
      totals: Seq[(String, Column)]): DataFrame = {
    val bucketKey = group :+ "_bucket"

    // within-bucket: exclusive prefix of b in value order (one row
    // per value ⇒ a ROWS frame is exact), folded straight into the
    // per-(group,bucket) aggregate — the histogram is scanned once.
    val wPrev = Window.partitionBy(bucketKey.map(col): _*)
      .orderBy(col(value)).rowsBetween(Window.unboundedPreceding, -1)
    val local = dots.foldLeft(bucketed) { case (d, (n, _, _)) =>
      d.withColumn(s"_p_$n",
        coalesce(sum(col(s"_b_$n")).over(wPrev), lit(0.0)))
    }
    val perBucketAggs =
      dots.flatMap { case (n, _, _) => Seq(
        sum(col(s"_a_$n") * col(s"_p_$n")).as(s"_in_$n"),
        sum(col(s"_a_$n")).as(s"_atot_$n"),
        sum(col(s"_b_$n")).as(s"_btot_$n"))
      } ++ totals.map { case (n, _) => sum(col(s"_t_$n")).as(s"_ttot_$n") }
    val perBucket = local.groupBy(bucketKey.map(col): _*)
      .agg(perBucketAggs.head, perBucketAggs.tail: _*)

    // cross-bucket term over the groups×buckets-row aggregate — the
    // windowless self-join again, so no single-partition sort node
    val rhs = perBucket.select(
      (group.map(c => col(c).as(s"_r_$c")) :+ col("_bucket").as("_r_bucket")) ++
        dots.map { case (n, _, _) => col(s"_btot_$n").as(s"_rbtot_$n") }: _*)
    val paired =
      if (group.isEmpty) perBucket.crossJoin(rhs)
      else perBucket.join(rhs,
        group.map(c => col(c) === col(s"_r_$c")).reduce(_ && _))
    val pairAggs =
      dots.flatMap { case (n, _, _) => Seq(
        first(col(s"_in_$n")).as(s"_in_$n"),
        first(col(s"_atot_$n")).as(s"_atot_$n"),
        sum(when(col("_r_bucket") < col("_bucket"), col(s"_rbtot_$n"))
          .otherwise(lit(0.0))).as(s"_below_$n"))
      } ++ totals.map { case (n, _) => first(col(s"_ttot_$n")).as(s"_ttot_$n") }
    val offs = paired.groupBy(bucketKey.map(col): _*)
      .agg(pairAggs.head, pairAggs.tail: _*)

    val finalAggs =
      dots.map { case (n, _, _) =>
        sum(col(s"_in_$n") + col(s"_atot_$n") * col(s"_below_$n")).as(n)
      } ++ totals.map { case (n, _) => sum(col(s"_ttot_$n")).as(n) }
    if (group.isEmpty) offs.agg(finalAggs.head, finalAggs.tail: _*)
    else offs.groupBy(group.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** [[prefixDotSums]] for the k-sample case: every dot product reads
    * the SAME prefix column (one `b` exclusive running sum, k `a`
    * vectors against it — the Kruskal-Wallis shape, where each group's
    * rank sum dots its own counts with the one pooled-count prefix).
    * [[prefixDotSums]] would build k identical window columns; this
    * builds one. Same exactness argument, same two-stage shape. */
  def prefixDotSumsShared(df: DataFrame, group: Seq[String], value: String,
      b: Column, dots: Seq[(String, Column)], totals: Seq[(String, Column)],
      buckets: Int = 32): DataFrame = {
    require(dots.nonEmpty)
    // checkpoint the NARROW bucketed histogram; the (row-wise, cheap)
    // a/b/t derivations re-derive from its blocks instead of tripling
    // the materialized width (checkpointing before the bucket join
    // measured slower: the window arm then re-runs the bounds
    // broadcast join per arm)
    val bucketed = withRangeBucket(df, group, value, buckets)
      .localCheckpoint(false)
    val weighted0 = dots.foldLeft(bucketed.withColumn("_b", b)) {
      case (d, (n, a)) => d.withColumn(s"_a_$n", a)
    }
    val weighted = totals.foldLeft(weighted0) { case (d, (n, w)) =>
      d.withColumn(s"_t_$n", w)
    }
    val bucketKey = group :+ "_bucket"

    // ONE exclusive prefix of b in value order, folded into the
    // per-(group,bucket) aggregate — the histogram is scanned once.
    val wPrev = Window.partitionBy(bucketKey.map(col): _*)
      .orderBy(col(value)).rowsBetween(Window.unboundedPreceding, -1)
    val local = weighted.withColumn("_p",
      coalesce(sum(col("_b")).over(wPrev), lit(0.0)))
    val perBucketAggs =
      dots.flatMap { case (n, _) => Seq(
        sum(col(s"_a_$n") * col("_p")).as(s"_in_$n"),
        sum(col(s"_a_$n")).as(s"_atot_$n"))
      } ++ Seq(sum(col("_b")).as("_btot")) ++
        totals.map { case (n, _) => sum(col(s"_t_$n")).as(s"_ttot_$n") }
    val perBucket = local.groupBy(bucketKey.map(col): _*)
      .agg(perBucketAggs.head, perBucketAggs.tail: _*)

    // one cross-bucket below-sum of b serves every dot
    val rhs = perBucket.select(
      (group.map(c => col(c).as(s"_r_$c")) :+ col("_bucket").as("_r_bucket")) :+
        col("_btot").as("_rbtot"): _*)
    val paired =
      if (group.isEmpty) perBucket.crossJoin(rhs)
      else perBucket.join(rhs,
        group.map(c => col(c) === col(s"_r_$c")).reduce(_ && _))
    val pairAggs =
      dots.flatMap { case (n, _) => Seq(
        first(col(s"_in_$n")).as(s"_in_$n"),
        first(col(s"_atot_$n")).as(s"_atot_$n"))
      } ++ Seq(sum(when(col("_r_bucket") < col("_bucket"), col("_rbtot"))
        .otherwise(lit(0.0))).as("_below")) ++
        totals.map { case (n, _) => first(col(s"_ttot_$n")).as(s"_ttot_$n") }
    val offs = paired.groupBy(bucketKey.map(col): _*)
      .agg(pairAggs.head, pairAggs.tail: _*)

    val finalAggs =
      dots.map { case (n, _) =>
        sum(col(s"_in_$n") + col(s"_atot_$n") * col("_below")).as(n)
      } ++ totals.map { case (n, _) => sum(col(s"_ttot_$n")).as(n) }
    if (group.isEmpty) offs.agg(finalAggs.head, finalAggs.tail: _*)
    else offs.groupBy(group.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Adds `_bucket`: an order-consistent range-bucket id in
    * [0, buckets). Boundaries are per-group approximate quantiles of
    * `value` over a 5% SAMPLE — boundary quality only balances
    * buckets, never changes an answer, and the sketch insert was the
    * boundary arm's whole cost (sampling cut q_mad 4.6 → 3.9 s at
    * sf0.1). Rows with equal values always share a bucket. A small
    * group can miss the sample entirely, so the join back is
    * left_outer and a null boundary set means bucket 0 — that group
    * runs single-bucket (it was tiny), it is never dropped. */
  private[graft] def withRangeBucket(df: DataFrame, group: Seq[String],
      value: String, buckets: Int): DataFrame = {
    if (buckets <= 1) return df.withColumn("_bucket", lit(0))
    val fracs = (1 until buckets).map(_.toDouble / buckets)
    val v = col(value).cast("double")
    // low accuracy on purpose, same reasoning as the sample
    val boundAgg = percentile_approx(v, typedLit(fracs), lit(128)).as("_bounds")
    val boundSrc = df.sample(0.05, 42L)
    val bounds =
      if (group.isEmpty) boundSrc.agg(boundAgg)
      else boundSrc.groupBy(group.map(col): _*).agg(boundAgg)
    val joined =
      if (group.isEmpty) df.crossJoin(broadcast(bounds))
      else df.join(broadcast(bounds), group, "left_outer")
    // codegen'd binary search — the interpreted size(filter(...))
    // lambda was the family's hottest expression (see LowerBound)
    joined
      .withColumn("_bucket",
        when(col("_bounds").isNull, lit(0))
          .otherwise(graft.functions.LowerBound(col("_bounds"), v)))
      .drop("_bounds")
  }

  /** `ntile(k)` reconstructed from a global row_number `rn` and group
    * size `n` (both from [[runningSums]] with a unique tie-break and
    * weight 1): the first `n % k` tiles get `n/k + 1` rows, the rest
    * `n/k` — exactly Spark's and SQL's NTILE. */
  def ntileOf(rn: Column, n: Column, k: Int): Column = {
    val base = (n.cast("long") / k).cast("long")
    val rem = n.cast("long") % k
    val fat = base + 1
    (when(rn <= rem * fat, (rn - 1).cast("long") / fat)
      .otherwise(rem + (rn - 1 - rem * fat).cast("long") / greatest(base, lit(1L)))
      + 1).cast("int")
  }
}
