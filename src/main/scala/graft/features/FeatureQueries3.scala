package graft.features

import graft.{QueryModule, Tables => T}
import graft.Util.{r4, r4z}
import graft.ml.LinearModel
import graft.operators.Rank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-hygiene extras: target-leakage screening and empirical
  * prediction intervals.
  *
  * Leakage screening computes corr(feature, label) for every numeric
  * candidate in ONE aggregate pass (corr decomposes into six
  * map-side-combinable sums), then unpivots the scalar row — the
  * 100 TB feature audit costs one scan regardless of feature count.
  *
  * Prediction intervals are conformal-style: fit on train, take
  * exact residual quantiles on test per segment — quantile inputs are
  * rounded so both engines interpolate identical values.
  */
object FeatureQueries3 extends QueryModule {

  val queries: Map[String, Q] = Map(
    "feat_leakage" -> ((s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
      val stats = li.agg(
        corr($"l_quantity", $"l_extendedprice").as("l_quantity"),
        corr($"l_discount", $"l_extendedprice").as("l_discount"),
        corr($"l_tax", $"l_extendedprice").as("l_tax"))
      stats.select(expr(
        """stack(3,
          |  'l_quantity', l_quantity,
          |  'l_discount', l_discount,
          |  'l_tax', l_tax) AS (feature, corr_with_label)""".stripMargin))
        .select($"feature", r4($"corr_with_label").as("corr_with_label"),
          (abs($"corr_with_label") > 0.5).as("leak_flag"))
        .orderBy($"feature")
    }),

    // Cyclic encoding of event hour/weekday — sin/cos pairs put
    // 23:00 next to 00:00 in feature space. Pure projection,
    // shuffle-free.
    "feat_cyclic" -> ((s, d) => {
      import s.implicits._
      val tau = 2 * math.Pi
      T.events(s, d)
        .select($"event_id", hour($"ts").as("h"),
          (weekday($"ts") + 1).as("dow"))
        .select($"event_id", $"h", $"dow",
          r4z(sin($"h" * (tau / 24))).as("hour_sin"),
          r4z(cos($"h" * (tau / 24))).as("hour_cos"),
          r4z(sin($"dow" * (tau / 7))).as("dow_sin"),
          r4z(cos($"dow" * (tau / 7))).as("dow_cos"))
        .orderBy($"event_id")
        .limit(500)
    }),

    // Per-customer lagged spend features (lag-1/2 + trailing-3 mean)
    // — the standard autoregressive feature block, one window per
    // customer ordered by order date.
    "feat_lag" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      T.orders(s, d)
        .filter($"o_custkey" < 100)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
        .withColumn("lag1", lag($"o_totalprice", 1).over(w))
        .withColumn("lag2", lag($"o_totalprice", 2).over(w))
        .withColumn("ma3",
          avg($"o_totalprice").over(w.rowsBetween(-2, 0)))
        .select($"o_custkey", $"o_orderkey",
          r4($"o_totalprice").as("o_totalprice"),
          r4($"lag1").as("lag1"), r4($"lag2").as("lag2"),
          r4($"ma3").as("ma3"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    "ml_pred_interval" -> ((s, d) => {
      import s.implicits._
      val joined = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment", $"o_orderkey", $"c_acctbal", $"o_totalprice")
      val split = Splits.byKeyModulo(joined, "o_orderkey")
      val train = split.filter($"split" === "train")
      val test = split.filter($"split" === "test")
      val models = LinearModel.fit(train, "c_acctbal", "o_totalprice",
        "c_mktsegment")
      test.join(broadcast(models), Seq("c_mktsegment"))
        .withColumn("resid",
          r4($"o_totalprice" - ($"slope" * $"c_acctbal" + $"intercept")))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_test"),
          r4(expr("percentile(resid, 0.05D)")).as("resid_q05"),
          r4(expr("percentile(resid, 0.95D)")).as("resid_q95"))
        .orderBy($"c_mktsegment")
    }),

    // Quantile normalization — every group's distribution mapped onto
    // the POOLED distribution (the batch-effect correction op): row at
    // within-group rank rn of n_g takes the pooled order statistic at
    // position ceil((rn−½)/n_g · N), computed with INTEGER-EXACT
    // arithmetic (k = ((2rn−1)·N + 2n_g−1) div 2n_g) so no float
    // boundary can flip a rank between engines. Both rank passes ride
    // [[graft.operators.Rank.runningSums]] — range-bucketed, never a
    // global sort — and the order-statistic lookup is a plain equi
    // join on the rank, linear at any scale. After normalization all
    // groups share the pooled shape, which the aggregate exhibits:
    // per-group means/sds nearly equal.
    "feat_quantile_norm" -> ((s, d) => {
      import s.implicits._
      val rows = T.orders(s, d).select($"o_orderpriority".as("g"),
        $"o_totalprice".cast("double").as("v"), $"o_orderkey".as("id"))
      val ranked = Rank.runningSums(rows, Seq("g"), "v", Seq("id"),
        Seq("rn" -> lit(1L)))
      val pooled = Rank.runningSums(
          rows.select($"v".as("pv"), $"id".as("pid")),
          Nil, "pv", Seq("pid"), Seq("pr" -> lit(1L)))
        .select($"pv", $"pr")
      val total = rows.agg(count(lit(1)).as("nn"))
      ranked.crossJoin(broadcast(total))
        .withColumn("k",
          expr("((2 * rn - 1) * nn + 2 * rn_total - 1) div (2 * rn_total)"))
        .join(pooled, $"k" === $"pr")
        .groupBy($"g").agg(
          count(lit(1)).as("n"),
          r4(avg($"pv")).as("mean_norm"),
          r4(stddev_samp($"pv")).as("sd_norm"))
        .orderBy($"g")
        .withColumnRenamed("g", "o_orderpriority")
    }),

    // Robust scaling — (x − median)/IQR, the outlier-insensitive
    // sibling of z-scoring — on the same one-scan discipline as
    // feat_winsorize: the (group, value, count) histogram feeds the
    // three quartiles AND every reported weighted aggregate, so
    // scaling costs no second pass over the fact table. Quartiles
    // are r4-rounded before use in BOTH engines (the winsorize
    // precedent), making the scaled values bit-identical.
    "feat_robust_scale" -> ((s, d) => {
      import s.implicits._
      val hist = T.orders(s, d)
        .groupBy($"o_orderpriority", $"o_totalprice".cast("double").as("v"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      // few-group literal path: quartiles fold in as literals
      val P = graft.operators.ExactPercentile
      val q = P.perGroupWeightedLocal(hist, "o_orderpriority", "v", "c",
        Seq("q1" -> 0.25, "med" -> 0.5, "q3" -> 0.75))
      def qc(nm: String) = P.litCol(
        q.map { case (g, m) => g -> P.r4d(m(nm)) }, $"o_orderpriority")
      hist
        .withColumn("sc", ($"v" - qc("med")) / (qc("q3") - qc("q1")))
        .groupBy($"o_orderpriority").agg(
          sum($"c").as("n"),
          r4(sum($"c" * $"sc") / sum($"c")).as("mean_scaled"),
          r4(sqrt((sum($"c" * $"sc" * $"sc") -
            sum($"c" * $"sc") * sum($"c" * $"sc") / sum($"c")) /
            (sum($"c") - 1))).as("sd_scaled"),
          r4(max(abs($"sc"))).as("max_abs_scaled"))
        .orderBy($"o_orderpriority")
    }),

    // Winsorization: per-group p05/p95 via the distributed exact
    // percentile, 3-row bounds broadcast back over the fact scan,
    // tails clipped in one aggregate. Bounds are 4dp-rounded on BOTH
    // engines before comparison so boundary rows classify identically.
    "feat_winsorize" -> ((s, d) => {
      import s.implicits._
      // One table scan: the (group, value, count) histogram feeds
      // both the p05/p95 bounds and every reported aggregate (count
      // tallies and count-weighted means), so clipping costs no
      // second pass over the fact table.
      val hist = T.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_extendedprice".cast("double").as("v"))
        .agg(count(lit(1)).as("c"))
        .persist() // cache, not checkpoint: measured faster (r18)
      // few-group literal path (see ExactPercentile.perGroupWeightedLocal):
      // the p05/p95 bounds come back driver-side and fold into the
      // closing aggregate as literal when-chains — no join, no window,
      // three literal-plan jobs instead of the generic chain
      val P = graft.operators.ExactPercentile
      val b = P.perGroupWeightedLocal(hist, "l_returnflag", "v", "c",
        Seq("lo" -> 0.05, "hi" -> 0.95))
      val loC = P.litCol(b.map { case (g, m) => g -> P.r4d(m("lo")) },
        $"l_returnflag")
      val hiC = P.litCol(b.map { case (g, m) => g -> P.r4d(m("hi")) },
        $"l_returnflag")
      hist.withColumn("lo", loC).withColumn("hi", hiC)
        .groupBy($"l_returnflag").agg(
          sum($"c").as("n"),
          sum(when($"v" < $"lo", $"c").otherwise(0L)).as("n_lo"),
          sum(when($"v" > $"hi", $"c").otherwise(0L)).as("n_hi"),
          r4(sum($"c" * $"v") / sum($"c")).as("mean_raw"),
          r4(sum($"c" * least(greatest($"v", $"lo"), $"hi")) / sum($"c"))
            .as("mean_wins"))
        .orderBy($"l_returnflag")
    }),

    // Decile lift/gains table: customers scored by pre-1998 spend,
    // labeled by a high-value 1998 conversion. Deciles come from the
    // distributed row_number (rank ascending on the NEGATED score =
    // score-descending ntile) — no global ntile window; the
    // cumulative capture is a 10×10 conditional self-join over the
    // decile aggregate, so no unpartitioned window exists anywhere.
    // ROC AUC of order value as a score for "urgent order" — the
    // Mann-Whitney identity AUC = (R⁺ − n₁(n₁+1)/2)/(n₁·n₀) over
    // midranks of the per-score-value histogram. R⁺ decomposes as
    // Σ np·(values strictly below) + Σ np·(c+1)/2: the first term is
    // Rank.prefixDotSums (aggregate-only — no per-row rank, no
    // offsets join-back, no global sort), the second is windowless.
    // Near 0.5 here (price doesn't predict priority in this data) —
    // the honest answer; the scale-correct machinery is the
    // deliverable.
    "ml_auc" -> ((s, d) => {
      import s.implicits._
      val pts = T.orders(s, d).select($"o_totalprice".as("v"),
        ($"o_orderpriority" === "1-URGENT").as("pos"))
      val per = pts.groupBy($"v").agg(
          count_if($"pos").as("np"), count_if(!$"pos").as("nn"))
        .withColumn("c", $"np" + $"nn")
      graft.operators.Rank.prefixDotSums(per, Nil, "v",
          dots = Seq(("below", $"np", $"c")),
          totals = Seq(("half", $"np" * ($"c" + 1) / 2.0),
            ("n1", $"np"), ("n0", $"nn")))
        .select($"n1".cast("long").as("n_pos"),
          $"n0".cast("long").as("n_neg"),
          r4(($"below" + $"half" - $"n1".cast("double") * ($"n1" + 1) / 2.0) /
            ($"n1".cast("double") * $"n0")).as("auc"))
    }),

    // Decision-threshold tuning: the F1-optimal score cutoff for
    // "predict urgent when price ≥ v", from ONE pass. Per distinct
    // score value, TP/FP are inclusive running sums in descending
    // score order on the distributed Rank primitive (no
    // single-partition window anywhere); F1 = 2TP/(TP+FP+P) divides
    // the same integers in both engines, so even the argmax ordering
    // is bit-exact (ties broken by the threshold value).
    "ml_best_threshold" -> ((s, d) => {
      import s.implicits._
      val per = T.orders(s, d)
        .select($"o_totalprice".as("v"),
          ($"o_orderpriority" === "1-URGENT").as("pos"))
        .groupBy($"v")
        .agg(count_if($"pos").as("np"), count_if(!$"pos").as("nn"))
      val run = graft.operators.Rank.runningSums(
        per.withColumn("neg", -$"v"), Nil, "neg", Seq("v"),
        Seq("tp" -> $"np", "fp" -> $"nn"))
      val f1 = lit(2.0) * $"tp" / ($"tp" + $"fp" + $"tp_total")
      run.select($"v", $"tp", $"fp",
          ($"tp_total" - $"tp").as("fn"), f1.as("f1"))
        .orderBy($"f1".desc, $"v".asc)
        .limit(1)
        .select(r4($"v").as("threshold"), $"tp", $"fp", $"fn",
          r4($"f1").as("f1"))
    }),

    "ml_lift" -> ((s, d) => {
      import s.implicits._
      // Score = pre-1998 spend in integer CENTS: a double sum's value
      // depends on partition/accumulation order, and a 4dp-rounded
      // double score let boundary customers land in different deciles
      // across engines (the round-5 hash mismatch). Summing
      // round(price*100) as BIGINT is order-independent and exact, so
      // decile assignment is identical everywhere.
      val cust = T.orders(s, d).groupBy($"o_custkey").agg(
          sum(when(year($"o_orderdate") < 1998,
            round($"o_totalprice" * 100).cast("long"))).as("pre"),
          max(when(year($"o_orderdate") >= 1998 && $"o_totalprice" > 150000,
            1).otherwise(0)).as("label"))
        .filter($"pre" > 0)
        .select($"o_custkey", $"pre".as("score"), $"label")
      val ranked = graft.operators.Rank.runningSums(
        cust.withColumn("neg", -$"score"),
        Nil, "neg", Seq("o_custkey"), Seq("rn" -> lit(1L)))
      val agg = ranked
        .withColumn("decile", graft.operators.Rank.ntileOf($"rn", $"rn_total", 10))
        .groupBy($"decile").agg(count(lit(1)).as("n"), sum($"label").as("conv"))
      val rhs = agg.select($"decile".as("d2"), $"n".as("n2"), $"conv".as("c2"))
      agg.crossJoin(rhs)
        .groupBy($"decile", $"n", $"conv")
        .agg(sum($"n2").as("tn"), sum($"c2").as("tc"),
          sum(when($"d2" <= $"decile", $"c2").otherwise(0L)).as("cumc"))
        // Integer BASIS POINTS via BIGINT floor-division — no doubles
        // anywhere: round-half-up(a/b) = (2a+b) div (2b) for a,b ≥ 0,
        // which is bit-identical in any engine (Spark rounds the
        // shortest-decimal repr HALF_UP while DuckDB rounds the binary
        // double, so round(conv/n*10000) can differ by 1 at x.5).
        .select($"decile", $"n", $"conv",
          expr("(conv * 20000 + n) div (2 * n)").as("rate_bp"),
          expr("(conv * tn * 20000 + n * tc) div (2 * n * tc)")
            .as("lift_bp"),
          expr("(cumc * 20000 + tc) div (2 * tc)").as("cum_capture_bp"))
        .orderBy($"decile")
    })
  )

  val oracles: Map[String, String] = Map(
    // same integer-exact rank mapping over window ranks — k can never
    // disagree across engines because no float enters it
    "feat_quantile_norm" ->
      """WITH r AS (SELECT o_orderpriority AS g, o_orderkey AS id,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS ng
        |  FROM orders),
        |p AS (SELECT o_totalprice AS pv,
        |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS pr
        |  FROM orders),
        |n AS (SELECT count(*) AS nn FROM orders),
        |k AS (SELECT g, ((2*rn - 1)*nn + 2*ng - 1) // (2*ng) AS kk
        |  FROM r, n)
        |SELECT g AS o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(pv), 4) AS mean_norm,
        |  round(stddev_samp(pv), 4) AS sd_norm
        |FROM k JOIN p ON kk = pr GROUP BY g ORDER BY g""".stripMargin,

    "feat_robust_scale" ->
      """WITH b AS (SELECT o_orderpriority AS g,
        |    round(quantile_cont(o_totalprice, 0.25), 4) AS q1,
        |    round(quantile_cont(o_totalprice, 0.5), 4) AS med,
        |    round(quantile_cont(o_totalprice, 0.75), 4) AS q3
        |  FROM orders GROUP BY 1),
        |sc AS (SELECT g, (o_totalprice - med)/(q3 - q1) AS s
        |  FROM orders JOIN b ON o_orderpriority = g)
        |SELECT g AS o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(s), 4) AS mean_scaled,
        |  round(stddev_samp(s), 4) AS sd_scaled,
        |  round(max(abs(s)), 4) AS max_abs_scaled
        |FROM sc GROUP BY g ORDER BY g""".stripMargin,

    "feat_leakage" ->
      """WITH stats AS (SELECT
        |    corr(l_quantity, l_extendedprice) AS q,
        |    corr(l_discount, l_extendedprice) AS d,
        |    corr(l_tax, l_extendedprice) AS t
        |  FROM lineitem)
        |SELECT feature, round(c, 4) AS corr_with_label,
        |  abs(c) > 0.5 AS leak_flag
        |FROM (
        |  SELECT 'l_quantity' AS feature, q AS c FROM stats
        |  UNION ALL SELECT 'l_discount', d FROM stats
        |  UNION ALL SELECT 'l_tax', t FROM stats)
        |ORDER BY feature""".stripMargin,

    "feat_cyclic" ->
      """SELECT event_id, h, dow,
        |  round(sin(h * (2 * pi() / 24)), 4) + 0 AS hour_sin,
        |  round(cos(h * (2 * pi() / 24)), 4) + 0 AS hour_cos,
        |  round(sin(dow * (2 * pi() / 7)), 4) + 0 AS dow_sin,
        |  round(cos(dow * (2 * pi() / 7)), 4) + 0 AS dow_cos
        |FROM (SELECT event_id,
        |    CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS h,
        |    CAST(extract(isodow FROM CAST(ts AS TIMESTAMP)) AS INT) AS dow
        |  FROM events)
        |ORDER BY event_id LIMIT 500""".stripMargin,

    "feat_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  round(o_totalprice, 4) AS o_totalprice,
        |  round(lag1, 4) AS lag1, round(lag2, 4) AS lag2,
        |  round(ma3, 4) AS ma3
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |    lag(o_totalprice, 1) OVER w AS lag1,
        |    lag(o_totalprice, 2) OVER w AS lag2,
        |    avg(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING
        |      AND CURRENT ROW) AS ma3
        |  FROM orders WHERE o_custkey < 100
        |  WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey))
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "ml_pred_interval" ->
      """WITH joined AS (
        |  SELECT c_mktsegment, o_orderkey, c_acctbal, o_totalprice
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |train AS (SELECT * FROM joined WHERE o_orderkey % 5 <> 0),
        |test AS (SELECT * FROM joined WHERE o_orderkey % 5 = 0),
        |models AS (
        |  SELECT c_mktsegment,
        |    covar_pop(o_totalprice, c_acctbal)/var_pop(c_acctbal) AS slope,
        |    avg(o_totalprice)
        |      - covar_pop(o_totalprice, c_acctbal)/var_pop(c_acctbal)*avg(c_acctbal) AS intercept
        |  FROM train GROUP BY c_mktsegment),
        |resids AS (SELECT t.c_mktsegment,
        |    round(o_totalprice - (m.slope*c_acctbal + m.intercept), 4) AS resid
        |  FROM test t JOIN models m ON t.c_mktsegment = m.c_mktsegment)
        |SELECT c_mktsegment, count(*) AS n_test,
        |  round(quantile_cont(resid, 0.05), 4) AS resid_q05,
        |  round(quantile_cont(resid, 0.95), 4) AS resid_q95
        |FROM resids GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "feat_winsorize" ->
      """WITH b AS (SELECT l_returnflag,
        |    round(quantile_cont(l_extendedprice, 0.05), 4) AS lo,
        |    round(quantile_cont(l_extendedprice, 0.95), 4) AS hi
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, count(*) AS n,
        |  count(*) FILTER (l_extendedprice < lo) AS n_lo,
        |  count(*) FILTER (l_extendedprice > hi) AS n_hi,
        |  round(avg(l_extendedprice), 4) AS mean_raw,
        |  round(avg(least(greatest(l_extendedprice, lo), hi)), 4) AS mean_wins
        |FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "ml_auc" ->
      """WITH pts AS (SELECT o_totalprice AS v,
        |    (o_orderpriority = '1-URGENT') AS pos FROM orders),
        |per AS (SELECT v, count(*) FILTER (pos) AS np,
        |    count(*) FILTER (NOT pos) AS nn FROM pts GROUP BY 1),
        |rk AS (SELECT np, nn, np + nn AS c,
        |    sum(np + nn) OVER (ORDER BY v) AS hi FROM per)
        |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
        |  CAST(sum(nn) AS BIGINT) AS n_neg,
        |  round((sum((hi - (c - 1) / 2.0) * np)
        |      - sum(np) * (sum(np) + 1) / 2.0)
        |    / (CAST(sum(np) AS DOUBLE) * sum(nn)), 4) AS auc
        |FROM rk""".stripMargin,

    "ml_best_threshold" ->
      """WITH per AS (
        |  SELECT o_totalprice AS v,
        |    count(*) FILTER (o_orderpriority = '1-URGENT') AS np,
        |    count(*) FILTER (o_orderpriority <> '1-URGENT') AS nn
        |  FROM orders GROUP BY 1),
        |run AS (
        |  SELECT v,
        |    CAST(sum(np) OVER (ORDER BY v DESC) AS BIGINT) AS tp,
        |    CAST(sum(nn) OVER (ORDER BY v DESC) AS BIGINT) AS fp,
        |    CAST((SELECT sum(np) FROM per) AS BIGINT) AS p
        |  FROM per)
        |SELECT round(v, 4) AS threshold, tp, fp,
        |  CAST(p - tp AS BIGINT) AS fn,
        |  round(2.0 * tp / (tp + fp + p), 4) AS f1
        |FROM run
        |ORDER BY 2.0 * tp / (tp + fp + p) DESC, v ASC LIMIT 1""".stripMargin,

    "ml_lift" ->
      """WITH cust AS (SELECT o_custkey,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      FILTER (year(o_orderdate) < 1998) AS pre,
        |    max(CASE WHEN year(o_orderdate) >= 1998
        |      AND o_totalprice > 150000 THEN 1 ELSE 0 END) AS label
        |  FROM orders GROUP BY 1),
        |scored AS (SELECT o_custkey, pre AS score, label
        |  FROM cust WHERE pre > 0),
        |dec AS (SELECT label,
        |    ntile(10) OVER (ORDER BY score DESC, o_custkey) AS decile
        |  FROM scored),
        |agg AS (SELECT decile, count(*) AS n,
        |    CAST(sum(label) AS BIGINT) AS conv
        |  FROM dec GROUP BY 1),
        |tot AS (SELECT CAST(sum(conv) AS BIGINT) AS tc,
        |    CAST(sum(n) AS BIGINT) AS tn FROM agg)
        |SELECT decile, n, conv,
        |  (conv * 20000 + n) // (2 * n) AS rate_bp,
        |  (conv * tn * 20000 + n * tc) // (2 * n * tc) AS lift_bp,
        |  (CAST(sum(conv) OVER (ORDER BY decile) AS BIGINT) * 20000 + tc)
        |    // (2 * tc) AS cum_capture_bp
        |FROM agg, tot ORDER BY decile""".stripMargin
  )
}
