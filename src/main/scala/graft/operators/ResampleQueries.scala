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

    // Two-round boosted regression stumps (the gradient-boosting
    // shape): round 1 fits the SSE-optimal split of price-cents on
    // quantity; round 2 fits a second stump on the RESIDUALS — whose
    // per-cell sums expand algebraically from the joint (side1 ×
    // side2) integer moment sums, so no residual column ever
    // materializes and each round is one aggregation pass. Reports
    // both thresholds, the leaf means, and train RMSE after each
    // round.
    "ml_boost2" -> ((s, d) => {
      import s.implicits._
      // repartition before the ×9 grid explode — the 2-column scan
      // collapses to a couple of input splits and the broadcast cross
      // join inherits them (same trap as q_bootstrap_ci)
      val base = T.lineitem(s, d).select(
        $"l_quantity".cast("long").as("x"),
        round($"l_extendedprice" * 100).cast("long").as("y"))
        .repartition(s.sparkContext.defaultParallelism)
        .localCheckpoint(false) // both rounds reuse the shuffled base
      val grid = s.range(1, 10).select(($"id" * 5).as("thr")) // 5..45
      val cells = base.crossJoin(broadcast(grid))
        .groupBy($"thr")
        .agg(count(lit(1)).as("tn"), sum($"y").as("tsy"),
          // y is cents: sum(y*y) tops 1e19 past sf0.1, over Long.Max —
          // sum in decimal(38,0), the JVM analog of DuckDB's HUGEINT
          sum(($"y" * $"y").cast("decimal(38,0)")).as("tsyy"),
          count_if($"x" < $"thr").as("nl"),
          sum(when($"x" < $"thr", $"y").otherwise(0L)).as("syl"),
          sum(when($"x" < $"thr", $"y" * $"y").otherwise(0L)
            .cast("decimal(38,0)")).as("syyl"))
      val sse1 = cells
        .withColumn("nr", $"tn" - $"nl")
        .withColumn("syr", $"tsy" - $"syl")
        .withColumn("sse",
          when($"nl" === 0 || $"nr" === 0, lit(Double.MaxValue)).otherwise(
            ($"syyl".cast("double") -
              $"syl".cast("double") * $"syl" / $"nl".cast("double")) +
              (($"tsyy" - $"syyl").cast("double") -
                $"syr".cast("double") * $"syr" / $"nr".cast("double"))))
      val best1 = sse1.orderBy($"sse", $"thr").limit(1)
        .select($"thr".as("t1"), ($"syl" / $"nl").as("pl"),
          ($"syr" / $"nr").as("pr"), $"sse".as("sse1"), $"tn".as("n"))
      // round 2: joint cells (x<t2) × (x<t1) from one pass
      val joint = base.crossJoin(broadcast(grid)).crossJoin(broadcast(best1))
        .groupBy($"thr", $"t1", $"pl", $"pr", $"sse1", $"n")
        .agg(
          count_if($"x" < $"thr" && $"x" < $"t1").as("na"),
          sum(when($"x" < $"thr" && $"x" < $"t1", $"y").otherwise(0L)).as("sya"),
          sum(when($"x" < $"thr" && $"x" < $"t1", $"y" * $"y").otherwise(0L).cast("decimal(38,0)")).as("syya"),
          count_if($"x" < $"thr" && $"x" >= $"t1").as("nb"),
          sum(when($"x" < $"thr" && $"x" >= $"t1", $"y").otherwise(0L)).as("syb"),
          sum(when($"x" < $"thr" && $"x" >= $"t1", $"y" * $"y").otherwise(0L).cast("decimal(38,0)")).as("syyb"),
          count_if($"x" >= $"thr" && $"x" < $"t1").as("nc"),
          sum(when($"x" >= $"thr" && $"x" < $"t1", $"y").otherwise(0L)).as("syc"),
          sum(when($"x" >= $"thr" && $"x" < $"t1", $"y" * $"y").otherwise(0L).cast("decimal(38,0)")).as("syyc"),
          count_if($"x" >= $"thr" && $"x" >= $"t1").as("nd"),
          sum(when($"x" >= $"thr" && $"x" >= $"t1", $"y").otherwise(0L)).as("syd"),
          sum(when($"x" >= $"thr" && $"x" >= $"t1", $"y" * $"y").otherwise(0L).cast("decimal(38,0)")).as("syyd"))
      // residual sums per stage-2 side, expanded from the joint cells
      val scored2 = joint
        .withColumn("srl", ($"sya" - $"na" * $"pl") + ($"syb" - $"nb" * $"pr"))
        .withColumn("srrl",
          ($"syya".cast("double") - lit(2.0) * $"pl" * $"sya" +
            $"na" * $"pl" * $"pl") +
            ($"syyb".cast("double") - lit(2.0) * $"pr" * $"syb" +
              $"nb" * $"pr" * $"pr"))
        .withColumn("srr", ($"syc" - $"nc" * $"pl") + ($"syd" - $"nd" * $"pr"))
        .withColumn("srrr",
          ($"syyc".cast("double") - lit(2.0) * $"pl" * $"syc" +
            $"nc" * $"pl" * $"pl") +
            ($"syyd".cast("double") - lit(2.0) * $"pr" * $"syd" +
              $"nd" * $"pr" * $"pr"))
        .withColumn("nl2", $"na" + $"nb")
        .withColumn("nr2", $"nc" + $"nd")
        .withColumn("sse2",
          when($"nl2" === 0 || $"nr2" === 0, lit(Double.MaxValue)).otherwise(
            ($"srrl" - $"srl" * $"srl" / $"nl2".cast("double")) +
              ($"srrr" - $"srr" * $"srr" / $"nr2".cast("double"))))
      scored2.orderBy($"sse2", $"thr").limit(1)
        .select($"t1", $"thr".as("t2"),
          r4($"pl" / 100.0).as("leaf_lo"), r4($"pr" / 100.0).as("leaf_hi"),
          r4(sqrt($"sse1" / $"n") / 100.0).as("rmse1"),
          r4(sqrt($"sse2" / $"n") / 100.0).as("rmse2"))
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

    "ml_boost2" ->
      """WITH base AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |grid AS (SELECT g.id * 5 AS thr
        |  FROM unnest(generate_series(1, 9)) AS g(id)),
        |cells AS (
        |  SELECT thr, count(*) AS tn, sum(y) AS tsy, sum(y*y) AS tsyy,
        |    count(*) FILTER (x < thr) AS nl,
        |    sum(CASE WHEN x < thr THEN y ELSE 0 END) AS syl,
        |    sum(CASE WHEN x < thr THEN y*y ELSE 0 END) AS syyl
        |  FROM base CROSS JOIN grid GROUP BY 1),
        |pre AS (
        |  SELECT thr, tn, nl, tn - nl AS nr, syl, tsy - syl AS syr,
        |    tsyy, syyl
        |  FROM cells),
        |sse1c AS (
        |  SELECT thr, tn, nl, nr, syl, syr,
        |    CASE WHEN nl = 0 OR nr = 0 THEN 1e308 ELSE
        |      (CAST(syyl AS DOUBLE)
        |        - CAST(syl AS DOUBLE) * syl / CAST(nl AS DOUBLE))
        |      + (CAST(tsyy - syyl AS DOUBLE)
        |        - CAST(syr AS DOUBLE) * syr / CAST(nr AS DOUBLE)) END AS sse
        |  FROM pre),
        |best1 AS (
        |  SELECT thr AS t1, syl / nl AS pl, syr / nr AS pr,
        |    sse AS sse1, tn AS n
        |  FROM sse1c ORDER BY sse, thr LIMIT 1),
        |joint AS (
        |  SELECT thr, t1, pl, pr, sse1, n,
        |    count(*) FILTER (x < thr AND x < t1) AS na,
        |    sum(CASE WHEN x < thr AND x < t1 THEN y ELSE 0 END) AS sya,
        |    sum(CASE WHEN x < thr AND x < t1 THEN y*y ELSE 0 END) AS syya,
        |    count(*) FILTER (x < thr AND x >= t1) AS nb,
        |    sum(CASE WHEN x < thr AND x >= t1 THEN y ELSE 0 END) AS syb,
        |    sum(CASE WHEN x < thr AND x >= t1 THEN y*y ELSE 0 END) AS syyb,
        |    count(*) FILTER (x >= thr AND x < t1) AS nc,
        |    sum(CASE WHEN x >= thr AND x < t1 THEN y ELSE 0 END) AS syc,
        |    sum(CASE WHEN x >= thr AND x < t1 THEN y*y ELSE 0 END) AS syyc,
        |    count(*) FILTER (x >= thr AND x >= t1) AS nd,
        |    sum(CASE WHEN x >= thr AND x >= t1 THEN y ELSE 0 END) AS syd,
        |    sum(CASE WHEN x >= thr AND x >= t1 THEN y*y ELSE 0 END) AS syyd
        |  FROM base CROSS JOIN grid CROSS JOIN best1
        |  GROUP BY 1, 2, 3, 4, 5, 6),
        |pre2 AS (
        |  SELECT thr, t1, pl, pr, sse1, n,
        |    (sya - na * pl) + (syb - nb * pr) AS srl,
        |    (CAST(syya AS DOUBLE) - 2.0 * pl * sya + na * pl * pl)
        |      + (CAST(syyb AS DOUBLE) - 2.0 * pr * syb + nb * pr * pr) AS srrl,
        |    (syc - nc * pl) + (syd - nd * pr) AS srr,
        |    (CAST(syyc AS DOUBLE) - 2.0 * pl * syc + nc * pl * pl)
        |      + (CAST(syyd AS DOUBLE) - 2.0 * pr * syd + nd * pr * pr) AS srrr,
        |    na + nb AS nl2, nc + nd AS nr2
        |  FROM joint),
        |sse2c AS (
        |  SELECT thr, t1, pl, pr, sse1, n,
        |    CASE WHEN nl2 = 0 OR nr2 = 0 THEN 1e308 ELSE
        |      (srrl - srl * srl / CAST(nl2 AS DOUBLE))
        |      + (srrr - srr * srr / CAST(nr2 AS DOUBLE)) END AS sse2
        |  FROM pre2)
        |SELECT t1, thr AS t2, round(pl / 100.0, 4) AS leaf_lo,
        |  round(pr / 100.0, 4) AS leaf_hi,
        |  round(sqrt(sse1 / n) / 100.0, 4) AS rmse1,
        |  round(sqrt(sse2 / n) / 100.0, 4) AS rmse2
        |FROM sse2c ORDER BY sse2, thr LIMIT 1""".stripMargin,

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
        |SELECT thr, round(gini, 4) AS gini, nl, nr,
        |  CAST(posl AS BIGINT) AS posl, CAST(posr AS BIGINT) AS posr
        |FROM gini ORDER BY gini, thr LIMIT 1""".stripMargin
  )
}
