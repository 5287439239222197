package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._

/** Resampling-based inference and greedy tree induction — two ops a
  * feature/evaluation pipeline needs beyond closed-form statistics:
  *
  *   - Poisson(1) bootstrap confidence interval for a mean: the
  *     scale-correct bootstrap (per-row independent weights — no
  *     global multinomial draw, so rows never need to see each other
  *     before aggregation; the standard approximation for distributed
  *     bootstrap). Weights derive from a 60-bit md5 prefix so the
  *     oracle replays the identical resamples.
  *   - Depth-1 decision stump: impurity-optimal threshold over a
  *     candidate grid, evaluated in ONE aggregation pass via a
  *     broadcast grid join (never a per-candidate scan).
  *
  * Both explode by a constant factor (B replicates / grid size) and
  * immediately re-aggregate with map-side combine, so the shuffle
  * carries B (or grid) rows per partition regardless of table size.
  */
object ResampleQueries extends QueryModule {

  /** Cumulative Poisson(1) thresholds P(X <= k), k = 0..5 — written
    * with full double precision so both engines parse the identical
    * binary literal. */
  private val poissonCdf = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)

  private def poissonCaseSql(u: String): String =
    poissonCdf.zipWithIndex
      .map { case (t, k) => s"WHEN $u < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 6 END")

  val queries: Map[String, Q] = Map(
    // 95% bootstrap CI for mean(o_totalprice), B = 100 Poisson
    // replicates. Prices sum as integer cents per replicate, so the
    // per-replicate means are exact integer ratios — bit-identical in
    // any engine and summation order; only the final percentile
    // interpolation touches doubles.
    "q_bootstrap_ci" -> ((s, d) => {
      import s.implicits._
      val b = 100
      // repartition BEFORE the ×B explode: the orders scan is a few
      // input splits, and without this the 100× blowup (and its md5
      // per replicate) would run on those few cores instead of all
      val rows = T.orders(s, d).select($"o_orderkey",
          round($"o_totalprice" * 100).cast("long").as("price_c"))
        .repartition(s.sparkContext.defaultParallelism)
        .select($"o_orderkey", $"price_c",
          explode(sequence(lit(0), lit(b - 1))).as("rep"))
        .withColumn("u",
          conv(substring(md5(concat($"o_orderkey", lit(":"), $"rep")), 1, 15),
            16, 10).cast("double") / lit(1152921504606846976.0)) // 2^60
        .withColumn("w", expr(poissonCaseSql("u")))
      val means = rows.groupBy($"rep")
        .agg((sum($"w" * $"price_c") / (sum($"w") * 100.0)).as("m"))
      means.agg(
          count(lit(1)).cast("long").as("n_boot"),
          r4(percentile($"m", lit(0.025))).as("ci_lo"),
          r4(percentile($"m", lit(0.5))).as("ci_mid"),
          r4(percentile($"m", lit(0.975))).as("ci_hi"))
    }),

    // Gini-optimal stump predicting urgent priority from total price
    // over a fixed 15-point threshold grid. One scan: broadcast the
    // grid, aggregate (n, pos) per (side, threshold), pick the
    // minimum weighted impurity (ties -> smallest threshold).
    "ml_stump" -> ((s, d) => {
      import s.implicits._
      val grid = s.range(1, 16)
        .select(($"id" * 25000.0).as("thr"))
      val o = T.orders(s, d).select($"o_totalprice".as("x"),
        ($"o_orderpriority" === "1-URGENT").cast("long").as("y"))
      val agg = o.crossJoin(broadcast(grid))
        .groupBy($"thr")
        .agg(count(lit(1)).as("n"), sum($"y").as("pos"),
          count_if($"x" < $"thr").as("nl"),
          sum(when($"x" < $"thr", $"y").otherwise(0L)).as("posl"))
      agg
        .withColumn("nr", $"n" - $"nl")
        .withColumn("posr", $"pos" - $"posl")
        // weighted Gini = sum_side (n_s/n) * (1 - (pos_s/n_s)^2 - (neg_s/n_s)^2)
        .withColumn("gini",
          when($"nl" === 0 || $"nr" === 0, lit(Double.MaxValue)).otherwise(
            ($"nl" / $"n") * (lit(1.0)
              - ($"posl" / $"nl") * ($"posl" / $"nl")
              - (($"nl" - $"posl") / $"nl") * (($"nl" - $"posl") / $"nl")) +
            ($"nr" / $"n") * (lit(1.0)
              - ($"posr" / $"nr") * ($"posr" / $"nr")
              - (($"nr" - $"posr") / $"nr") * (($"nr" - $"posr") / $"nr"))))
        .orderBy($"gini", $"thr")
        .limit(1)
        .select($"thr", r4($"gini").as("gini"), $"nl", $"nr", $"posl", $"posr")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_bootstrap_ci" -> {
      val u = "((('0x' || substr(md5(o_orderkey || ':' || rep), 1, 15))::BIGINT)" +
        " / 1152921504606846976.0)"
      s"""WITH reps AS (
         |  SELECT o_orderkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_c, rep
         |  FROM orders, LATERAL unnest(generate_series(0, 99)) AS g(rep)),
         |w AS (SELECT rep, price_c, ${poissonCaseSql(u)} AS w FROM reps),
         |means AS (
         |  SELECT rep, sum(w * price_c) / (sum(w) * 100.0) AS m
         |  FROM w GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_boot,
         |  round(quantile_cont(m, 0.025), 4) AS ci_lo,
         |  round(quantile_cont(m, 0.5), 4) AS ci_mid,
         |  round(quantile_cont(m, 0.975), 4) AS ci_hi
         |FROM means""".stripMargin
    },

    "ml_stump" ->
      """WITH grid AS (
        |  SELECT g.id * 25000.0 AS thr
        |  FROM unnest(generate_series(1, 15)) AS g(id)),
        |agg AS (
        |  SELECT thr, count(*) AS n,
        |    sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS pos,
        |    count(*) FILTER (o_totalprice < thr) AS nl,
        |    sum(CASE WHEN o_totalprice < thr
        |      AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS posl
        |  FROM orders CROSS JOIN grid GROUP BY 1),
        |sides AS (
        |  SELECT thr, n, nl, n - nl AS nr, posl, pos - posl AS posr FROM agg),
        |gini AS (
        |  SELECT thr, nl, nr, posl, posr,
        |    CASE WHEN nl = 0 OR nr = 0 THEN 1e308 ELSE
        |      (nl / CAST(n AS DOUBLE)) * (1.0
        |        - (posl / CAST(nl AS DOUBLE)) * (posl / CAST(nl AS DOUBLE))
        |        - ((nl - posl) / CAST(nl AS DOUBLE)) * ((nl - posl) / CAST(nl AS DOUBLE))) +
        |      (nr / CAST(n AS DOUBLE)) * (1.0
        |        - (posr / CAST(nr AS DOUBLE)) * (posr / CAST(nr AS DOUBLE))
        |        - ((nr - posr) / CAST(nr AS DOUBLE)) * ((nr - posr) / CAST(nr AS DOUBLE))) END AS gini
        |  FROM sides)
        |SELECT thr, round(gini, 4) AS gini, nl, nr, posl, posr
        |FROM gini ORDER BY gini, thr LIMIT 1""".stripMargin
  )
}
