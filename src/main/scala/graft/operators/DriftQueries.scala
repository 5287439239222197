package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution monitoring: inequality and train/serve drift — the
  * checks a production data pipeline runs between ingestion batches.
  *
  * All three reduce the fact stream to per-group counts or the
  * distinct-value grid BEFORE any window, so the ordered pass touches
  * thousands of rows regardless of corpus size, and every aggregate
  * decomposes map-side.
  */
object DriftQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    // Gini coefficient of customer spend: rank-weighted form
    // G = 2·Σ(i·vᵢ)/(n·Σv) − (n+1)/n over ascending per-customer
    // totals (4dp-rounded so both engines rank identical values).
    "q_gini" -> ((s, d) => {
      import s.implicits._
      val cust = T.orders(s, d).groupBy($"o_custkey")
        .agg(r4(sum($"o_totalprice")).as("v"))
      // global ascending rank i without a single-task full sort:
      // distributed row_number via range buckets + prefix offsets.
      cust.transform(Rank.runningSums(_, Nil, "v", Seq("o_custkey"),
          Seq("i" -> lit(1L))))
        .agg(r4(lit(2) * sum($"i" * $"v") / (count(lit(1)) * sum($"v")) -
          (count(lit(1)) + 1) / count(lit(1)).cast("double")).as("gini"),
          count(lit(1)).as("n_customers"))
    }),

    // Population stability index of the order-total distribution,
    // 1997 vs 1998, over fixed decade-of-thousands bins. PSI ≥ 0.2
    // is the classic "investigate drift" threshold.
    "dq_drift" -> ((s, d) => {
      import s.implicits._
      val binned = T.orders(s, d)
        .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
        .select(
          (year($"o_orderdate") === 1997).as("is_base"),
          least(floor($"o_totalprice" / 50000), lit(5)).cast("int").as("bin"))
      val counts = binned.groupBy($"bin").agg(
        count_if($"is_base").as("n1"),
        count_if(!$"is_base").as("n2"))
      val tot = counts.agg(sum($"n1").as("t1"), sum($"n2").as("t2"))
      counts.crossJoin(broadcast(tot))
        .select($"bin",
          ($"n1" / $"t1").as("p1"), ($"n2" / $"t2").as("p2"))
        .agg(r4(sum(($"p1" - $"p2") * log($"p1" / $"p2"))).as("psi"),
          count(lit(1)).as("n_bins"))
    }),

    // Jensen-Shannon divergence between the same two periods and
    // fixed bins as dq_drift: symmetric, bounded [0, ln 2], defined
    // even when one side has empty bins (unlike PSI/KL) — the
    // 0·ln 0 = 0 convention is honored EXPLICITLY with a p>0 guard
    // (a bare p*ln(p/m) yields NaN on an empty bin and poisons the
    // sum); the bin-count decomposition makes it one aggregate pass.
    "dq_js_divergence" -> ((s, d) => {
      import s.implicits._
      val binned = T.orders(s, d)
        .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
        .select(
          (year($"o_orderdate") === 1997).as("is_base"),
          least(floor($"o_totalprice" / 50000), lit(5)).cast("int").as("bin"))
      val counts = binned.groupBy($"bin").agg(
        count_if($"is_base").as("n1"),
        count_if(!$"is_base").as("n2"))
      val tot = counts.agg(sum($"n1").as("t1"), sum($"n2").as("t2"))
      counts.crossJoin(broadcast(tot))
        .select(($"n1" / $"t1").as("p"), ($"n2" / $"t2").as("q"))
        .withColumn("m", ($"p" + $"q") / 2)
        .agg(r4(lit(0.5) *
            sum(when($"p" > 0, $"p" * log($"p" / $"m")).otherwise(0.0)) +
          lit(0.5) *
            sum(when($"q" > 0, $"q" * log($"q" / $"m")).otherwise(0.0))).as("js"),
          count(lit(1)).as("n_bins"))
    }),

    // Kolmogorov-Smirnov two-sample statistic (BUILDING vs MACHINERY
    // segment spend): running ECDFs over the merged distinct-value
    // grid — one ordered window over per-value counts, no pairwise
    // comparisons.
    "q_ks_test" -> ((s, d) => {
      import s.implicits._
      val seg = T.orders(s, d)
        .join(broadcast(T.customer(s, d)
            .filter($"c_mktsegment".isin("BUILDING", "MACHINERY"))
            .select($"c_custkey", $"c_mktsegment")),
          $"o_custkey" === $"c_custkey")
        .select(($"c_mktsegment" === "BUILDING").as("a"),
          r4($"o_totalprice").as("v"))
      val perVal = seg.groupBy($"v").agg(
        count_if($"a").as("ca"), count_if(!$"a").as("cb"))
      // both running ECDFs in ONE distributed-rank pass (range
      // buckets + prefix offsets — no single-task global sort), with
      // the grand totals falling out as the `_total` columns.
      perVal
        .transform(Rank.runningSums(_, Nil, "v", Nil,
          Seq("cum_a" -> $"ca", "cum_b" -> $"cb")))
        .agg(r4(max(abs($"cum_a" / $"cum_a_total" -
          $"cum_b" / $"cum_b_total"))).as("ks"),
          max($"cum_a_total").as("n_a"), max($"cum_b_total").as("n_b"))
    }),

    // Spearman rank correlation per group: average ranks (tie =
    // midrank) come from the distributed rank primitive over the
    // DISTINCT (group, value) sets — avg_rank = hi_rank − (c−1)/2 —
    // joined back to the rows on the value key (the x-side rank
    // frame is distinct-value cardinality; AQE broadcasts the small
    // one). No per-group single-task sort anywhere, unlike the
    // textbook rank()-window formulation.
    "q_spearman" -> ((s, d) => {
      import s.implicits._
      // The 3-column projection is checkpointed ONCE. Midranks come
      // from the MARGINAL histograms, so rows need no joint (x, y)
      // dedup. x = l_quantity has a bounded domain (≤50 distinct
      // values per group at ANY scale), so its rank pass skips the
      // range-bucket machinery (buckets=1 ⇒ a ≤50-row window per
      // group, forever) and its rank frame broadcasts.
      //
      // Round-9 fold: rows collapse to the (f, y) GRID exactly once,
      // carrying the x-rank partial moments (Σrx, Σrx²) — the grid's
      // count IS the y-marginal histogram, so the y rank pass AND
      // every final moment (Σrx·ry = Σ_y ry·Σ_{rows@y}rx) derive from
      // the grid. The old plan's row-level shuffle join against the
      // y-rank frame (the dominant cost: every row moved a second
      // time) no longer exists. corr is the co-moment form over
      // midranks — double sums carry ~1e-11 relative error here, far
      // inside the 4dp compare.
      //
      // sf1-slope adjudication (round 12, closing the round-11 "2.70×
      // unprofiled" flag): y = l_extendedprice is continuous, so the
      // (f, y) grid grows 1:1 WITH ROWS — there is no quadratic arm
      // anywhere.
      //
      // Round-15 fold: SINGLE-LINEAGE grid. prefixDotSumsLit takes
      // bucket bounds as plan literals (sampled from the cheap pruned
      // ROW scan, not the built grid) and computes cross-bucket
      // offsets with the array-HOF fold instead of a self-join, so
      // the grid has exactly one consumer — no checkpoint, no bounds
      // re-run of the scan+join+shuffle upstream. Two rejected
      // shapes, both measured at sf0.1: a joint (f, x, y) histogram
      // feeding both marginals (2.83 s — y is continuous, the extra
      // shuffle reduces nothing) and checkpoint-grid + bounds off the
      // blocks (2.40 s — materializing a row-scale frame costs more
      // than the recompute it saves). This plan: 1.97 → 1.17 s.
      val rows = T.lineitem(s, d).select($"l_returnflag".as("f"),
          $"l_quantity".cast("double").as("x"),
          $"l_extendedprice".cast("double").as("y"))
      val xVals = rows.groupBy($"f", $"x").agg(count(lit(1)).as("c"))
      // plain window is safe here and skips the rank machinery's
      // checkpoint job: the partition is the ≤50-distinct-value
      // x-histogram, bounded at ANY scale
      val wx = org.apache.spark.sql.expressions.Window
        .partitionBy($"f").orderBy($"x")
      val xRanks = xVals.withColumn("hi", sum($"c").over(wx))
        .select($"f", $"x", ($"hi" - ($"c" - 1) / 2.0).as("rx"))
      val grid = rows.join(broadcast(xRanks), Seq("f", "x"))
        .groupBy($"f", $"y").agg(count(lit(1)).as("c"),
          sum($"rx").as("sx_y"), sum($"rx" * $"rx").as("sxx_y"))
        .withColumn("cd", $"c".cast("double"))
      // Constant literal bounds — no bounds job at all (the sampled
      // variant still decodes the full column to filter 5%, ~0.3 s).
      // extendedprice = qty(1..50) × partprice(≈900..2100): equal-
      // width over its closed-form envelope is imbalanced but
      // boundaries are balance-only; values outside land in the edge
      // buckets and stay exact.
      val yBounds = (1 until 32).map(i => 900.0 + i * (104100.0 / 32))
      // Midrank identities close the y side WITHOUT a per-row rank
      // column: with ry = below(y) + (c+1)/2,
      //   Σ c·ry  = n(n+1)/2                       (ties don't move it),
      //   Σ c·ry² = n(n+1)(2n+1)/6 − Σ(c³−c)/12    (tie correction),
      // so only Σ sx_y·ry needs the prefix term — ONE aggregate-only
      // prefixDotSums pass over the grid (no per-row ranks, no
      // offsets join-back), everything else is a plain total.
      Rank.prefixDotSumsLit(grid, Seq("f"), "y",
          dots = Seq(("sxb", $"sx_y", $"cd")),
          totals = Seq(("n", $"cd"), ("sx", $"sx_y"), ("sxx", $"sxx_y"),
            ("sxh", $"sx_y" * ($"cd" + 1) / 2.0),
            ("tcy", $"cd" * $"cd" * $"cd" - $"cd")),
          bounds = yBounds)
        .withColumn("sxy", $"sxb" + $"sxh")
        .withColumn("sy", $"n" * ($"n" + 1) / 2.0)
        .withColumn("syy",
          $"n" * ($"n" + 1) * ($"n" * 2 + 1) / 6.0 - $"tcy" / 12.0)
        .select($"f".as("l_returnflag"),
          r4(($"n" * $"sxy" - $"sx" * $"sy") /
            sqrt(($"n" * $"sxx" - $"sx" * $"sx") *
              ($"n" * $"syy" - $"sy" * $"sy"))).as("spearman"),
          $"n".cast("long").as("n"))
        .orderBy($"l_returnflag")
    }),

    // Mann-Whitney U (BUILDING vs MACHINERY spend): rank-sum over
    // per-value counts with midrank ties and the tie-corrected
    // normal approximation. The rank sum Σ ca·midrank decomposes as
    // Σ ca·(count strictly below) + Σ ca·(c+1)/2: the first term is
    // the aggregate-only Rank.prefixDotSums over the distinct-value
    // grid (no row-level ranking, no per-row rank column, no offsets
    // join-back), the rest are windowless sums of the same pass.
    // Counts are cast to double before the cubic/quadratic terms so
    // the arithmetic can't overflow longs at any scale.
    "q_mannwhitney" -> ((s, d) => {
      import s.implicits._
      val seg = T.orders(s, d)
        .join(broadcast(T.customer(s, d)
            .filter($"c_mktsegment".isin("BUILDING", "MACHINERY"))
            .select($"c_custkey", $"c_mktsegment")),
          $"o_custkey" === $"c_custkey")
        .select(($"c_mktsegment" === "BUILDING").as("a"),
          r4($"o_totalprice").as("v"))
      val perVal = seg.groupBy($"v").agg(
          count_if($"a").as("ca"), count_if(!$"a").as("cb"))
        .withColumn("c", $"ca" + $"cb")
      Rank.prefixDotSums(perVal, Nil, "v",
          dots = Seq(("below", $"ca", $"c")),
          totals = Seq(("half", $"ca" * ($"c" + 1) / 2.0),
            ("na", $"ca"), ("nb", $"cb"),
            ("ties", $"c".cast("double") * $"c" * $"c" - $"c"),
            ("n", $"c")))
        .withColumn("ra", $"below" + $"half")
        .select(
          r4($"ra" - $"na".cast("double") * ($"na" + 1) / 2.0).as("u_stat"),
          $"na", $"nb",
          r4(($"ra" - $"na".cast("double") * ($"na" + 1) / 2.0 -
              $"na".cast("double") * $"nb" / 2.0) /
            sqrt(($"na".cast("double") * $"nb" / 12.0) *
              (($"n" + 1) - $"ties" /
                ($"n".cast("double") * ($"n" - 1))))).as("z"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_gini" ->
      """WITH cust AS (SELECT o_custkey, round(sum(o_totalprice), 4) AS v
        |  FROM orders GROUP BY 1),
        |ranked AS (SELECT v,
        |    row_number() OVER (ORDER BY v, o_custkey) AS i FROM cust)
        |SELECT round(2 * sum(i * v) / (count(*) * sum(v))
        |    - (count(*) + 1) / CAST(count(*) AS DOUBLE), 4) AS gini,
        |  count(*) AS n_customers
        |FROM ranked""".stripMargin,

    "dq_drift" ->
      """WITH binned AS (SELECT
        |    (year(o_orderdate) = 1997) AS is_base,
        |    CAST(least(floor(o_totalprice / 50000), 5) AS INT) AS bin
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1999-01-01'),
        |counts AS (SELECT bin,
        |    count(*) FILTER (is_base) AS n1,
        |    count(*) FILTER (NOT is_base) AS n2
        |  FROM binned GROUP BY 1),
        |tot AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM counts)
        |SELECT round(sum((n1 / CAST(t1 AS DOUBLE) - n2 / CAST(t2 AS DOUBLE))
        |    * ln((n1 / CAST(t1 AS DOUBLE)) / (n2 / CAST(t2 AS DOUBLE)))), 4)
        |    AS psi,
        |  count(*) AS n_bins
        |FROM counts CROSS JOIN tot""".stripMargin,

    "q_ks_test" ->
      """WITH seg AS (SELECT (c_mktsegment = 'BUILDING') AS a,
        |    round(o_totalprice, 4) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |per_val AS (SELECT v, count(*) FILTER (a) AS ca,
        |    count(*) FILTER (NOT a) AS cb
        |  FROM seg GROUP BY 1),
        |tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM per_val),
        |cum AS (SELECT
        |    sum(ca) OVER (ORDER BY v) AS cum_a,
        |    sum(cb) OVER (ORDER BY v) AS cum_b
        |  FROM per_val)
        |SELECT round(max(abs(cum_a / CAST(na AS DOUBLE)
        |    - cum_b / CAST(nb AS DOUBLE))), 4) AS ks,
        |  CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b
        |FROM cum CROSS JOIN tot""".stripMargin,

    "dq_js_divergence" ->
      """WITH binned AS (SELECT (year(o_orderdate) = 1997) AS is_base,
        |    CAST(least(floor(o_totalprice / 50000), 5) AS INT) AS bin
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1999-01-01'),
        |counts AS (SELECT bin, count(*) FILTER (is_base) AS n1,
        |    count(*) FILTER (NOT is_base) AS n2 FROM binned GROUP BY 1),
        |tot AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM counts),
        |pq AS (SELECT n1/CAST(t1 AS DOUBLE) AS p, n2/CAST(t2 AS DOUBLE) AS q,
        |    (n1/CAST(t1 AS DOUBLE) + n2/CAST(t2 AS DOUBLE))/2 AS m
        |  FROM counts, tot)
        |SELECT round(0.5*sum(CASE WHEN p > 0 THEN p*ln(p/m) ELSE 0 END)
        |    + 0.5*sum(CASE WHEN q > 0 THEN q*ln(q/m) ELSE 0 END), 4) AS js,
        |  count(*) AS n_bins FROM pq""".stripMargin,

    // midrank = rank() (min rank) + (peer count − 1)/2, the textbook
    // average-rank construction — identical to the Spark side's
    // hi_rank − (c−1)/2 since hi = min + c − 1.
    "q_spearman" ->
      """WITH r AS (SELECT l_returnflag AS f,
        |  rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |    + (count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1)/2.0 AS rx,
        |  rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
        |    + (count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1)/2.0 AS ry
        |  FROM lineitem)
        |SELECT f AS l_returnflag, round(corr(rx, ry), 4) AS spearman,
        |  count(*) AS n
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_mannwhitney" ->
      """WITH seg AS (SELECT (c_mktsegment = 'BUILDING') AS a,
        |    round(o_totalprice, 4) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |r AS (SELECT a,
        |    rank() OVER (ORDER BY v)
        |      + (count(*) OVER (PARTITION BY v) - 1)/2.0 AS rk
        |  FROM seg),
        |s AS (SELECT sum(rk) FILTER (a) AS ra, count(*) FILTER (a) AS na,
        |    count(*) FILTER (NOT a) AS nb FROM r),
        |t AS (SELECT sum(CAST(cnt AS DOUBLE)*cnt*cnt - cnt) AS ties,
        |    sum(cnt) AS n
        |  FROM (SELECT count(*) AS cnt FROM seg GROUP BY v))
        |SELECT round(ra - CAST(na AS DOUBLE)*(na+1)/2.0, 4) AS u_stat,
        |  na, nb,
        |  round((ra - CAST(na AS DOUBLE)*(na+1)/2.0
        |      - CAST(na AS DOUBLE)*nb/2.0) /
        |    sqrt((CAST(na AS DOUBLE)*nb/12.0) *
        |      ((n+1) - ties/(CAST(n AS DOUBLE)*(n-1)))), 4) AS z
        |FROM s, t""".stripMargin
  )
}
