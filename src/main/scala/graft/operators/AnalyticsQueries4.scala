package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth analytics tranche — model evaluation and profiling shapes
  * built on exact-integer moment sums, so every statistic derives
  * from order-independent aggregates and no per-row float residual
  * ever needs summing:
  *
  *   - k-fold cross-validation of closed-form simple regression in
  *     ONE scan: per-fold integer moment sums; each fold's held-out
  *     fit uses (total − fold) complement algebra, and the test RMSE
  *     expands algebraically from the same moments — 1 scan for k
  *     folds instead of 2k;
  *   - cohort lifetime-value curves (first-order-year cohorts ×
  *     order-age, cumulative integer-cent revenue);
  *   - higher-moment profiling (skewness/kurtosis) from raw power
  *     sums over integral-valued columns.
  */
object AnalyticsQueries4 extends QueryModule {

  val queries: Map[String, Q] = Map(
    // 5-fold CV of l_extendedprice ~ l_quantity. Folds assigned by
    // l_orderkey % 5 (deterministic, engine-agnostic). All moment
    // sums are exact BIGINTs (price in cents, quantity integral); the
    // double algebra on top sees identical inputs in both engines.
    "ml_kfold" -> ((s, d) => {
      import s.implicits._
      val m = T.lineitem(s, d).select(
          ($"l_orderkey" % 5).cast("int").as("fold"),
          $"l_quantity".cast("long").as("x"),
          round($"l_extendedprice" * 100).cast("long").as("y"))
        .groupBy($"fold")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"x").as("sxx"),
          // cents-squared (and x·cents at extreme SF) overflow Long:
          // sum in decimal(38,0), the JVM analog of DuckDB's HUGEINT
          sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"),
          sum(($"y" * $"y").cast("decimal(38,0)")).as("syy"))
      val tot = m.agg(sum($"n").as("tn"), sum($"sx").as("tsx"),
        sum($"sy").as("tsy"), sum($"sxx").as("tsxx"),
        sum($"sxy").as("tsxy"), sum($"syy").as("tsyy"))
      m.crossJoin(broadcast(tot))
        // train = complement of the fold; all in cents space
        .withColumn("cn", ($"tn" - $"n").cast("double"))
        .withColumn("cx", ($"tsx" - $"sx").cast("double"))
        .withColumn("cy", ($"tsy" - $"sy").cast("double"))
        .withColumn("cxx", ($"tsxx" - $"sxx").cast("double"))
        .withColumn("cxy", ($"tsxy" - $"sxy").cast("double"))
        .withColumn("b",
          ($"cn" * $"cxy" - $"cx" * $"cy") / ($"cn" * $"cxx" - $"cx" * $"cx"))
        .withColumn("a", ($"cy" - $"b" * $"cx") / $"cn")
        // held-out SSE = Syy - 2a·Sy - 2b·Sxy + n·a² + 2ab·Sx + b²·Sxx
        .withColumn("sse",
          $"syy" - lit(2.0) * $"a" * $"sy" - lit(2.0) * $"b" * $"sxy" +
            $"n" * $"a" * $"a" + lit(2.0) * $"a" * $"b" * $"sx" +
            $"b" * $"b" * $"sxx")
        .select($"fold", $"n".as("n_test"),
          r4($"b").as("slope_c"), r4($"a" / 100.0).as("intercept"),
          r4(sqrt($"sse" / $"n") / 100.0).as("rmse"))
        .orderBy($"fold")
    }),

    // Learning curve in ONE scan: regression quality vs training-set
    // size. Buckets 0..3 accumulate into growing training sets via a
    // cumulative window over the 4 bucket-level moment rows (window
    // input is bucket-count-sized, post-aggregation); bucket 4 is the
    // fixed holdout, its RMSE expanded algebraically from exact sums.
    "ml_learning_curve" -> ((s, d) => {
      import s.implicits._
      val m = T.lineitem(s, d).select(
          ($"l_orderkey" % 5).cast("int").as("bucket"),
          $"l_quantity".cast("long").as("x"),
          round($"l_extendedprice" * 100).cast("long").as("y"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"x").as("sxx"),
          sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"),
          sum(($"y" * $"y").cast("decimal(38,0)")).as("syy"))
      val w = org.apache.spark.sql.expressions.Window.orderBy($"bucket")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val train = m.filter($"bucket" < 4)
        .withColumn("cn", sum($"n").over(w).cast("double"))
        .withColumn("cx", sum($"sx").over(w).cast("double"))
        .withColumn("cy", sum($"sy").over(w).cast("double"))
        .withColumn("cxx", sum($"sxx").over(w).cast("double"))
        .withColumn("cxy", sum($"sxy").over(w).cast("double"))
      val test = m.filter($"bucket" === 4).select(
        $"n".as("hn"), $"sx".as("hsx"), $"sy".as("hsy"),
        $"sxx".as("hsxx"), $"sxy".as("hsxy"), $"syy".as("hsyy"))
      train.crossJoin(broadcast(test))
        .withColumn("b",
          ($"cn" * $"cxy" - $"cx" * $"cy") / ($"cn" * $"cxx" - $"cx" * $"cx"))
        .withColumn("a", ($"cy" - $"b" * $"cx") / $"cn")
        .withColumn("sse",
          $"hsyy" - lit(2.0) * $"a" * $"hsy" - lit(2.0) * $"b" * $"hsxy" +
            $"hn" * $"a" * $"a" + lit(2.0) * $"a" * $"b" * $"hsx" +
            $"b" * $"b" * $"hsxx")
        .select(($"bucket" + 1).as("n_train_buckets"),
          $"cn".cast("long").as("train_n"),
          r4($"b").as("slope_c"),
          r4(sqrt($"sse" / $"hn") / 100.0).as("holdout_rmse"))
        .orderBy($"n_train_buckets")
    }),

    // Cohort LTV: customers cohorted by first-order year; cumulative
    // per-cohort revenue by order age in years. Integer cents keep
    // the running sums exact through the cumulative window.
    "q_ltv_cohort" -> ((s, d) => {
      import s.implicits._
      val first = T.orders(s, d).groupBy($"o_custkey".as("ck"))
        .agg(min(year($"o_orderdate")).as("cohort"))
      val aged = T.orders(s, d)
        .join(first, $"o_custkey" === $"ck")
        .groupBy($"cohort", (year($"o_orderdate") - $"cohort").as("age"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round($"o_totalprice" * 100).cast("long")).as("rev_c"))
      val w = Window.partitionBy($"cohort").orderBy($"age")
      aged
        .withColumn("cum_rev_c", sum($"rev_c").over(w))
        .select($"cohort", $"age", $"n_orders",
          r4($"cum_rev_c" / 100.0).as("cum_revenue"))
        .orderBy($"cohort", $"age")
    }),

    // Residual diagnostics for the global linear fit: mean residual
    // per quantity value. A sloped or U-shaped profile exposes
    // nonlinearity no holdout RMSE shows. Fit and per-bucket means
    // both come from exact integer moment sums — the residual mean
    // per bucket is algebra over (n, sy) with the broadcast (a, b),
    // so nothing row-level ever materializes.
    "ml_residual_profile" -> ((s, d) => {
      import s.implicits._
      val m = T.lineitem(s, d).select(
          $"l_quantity".cast("long").as("x"),
          round($"l_extendedprice" * 100).cast("long").as("y"))
        .groupBy($"x")
        .agg(count(lit(1)).as("n"), sum($"y").as("sy"))
      val tot = m.agg(
        sum($"n").cast("double").as("tn"),
        sum($"x" * $"n").cast("double").as("tsx"),
        sum($"sy").cast("double").as("tsy"),
        sum($"x" * $"x" * $"n").cast("double").as("tsxx"),
        sum(($"x" * $"sy").cast("decimal(38,0)")).cast("double").as("tsxy"))
      m.crossJoin(broadcast(tot))
        .withColumn("b",
          ($"tn" * $"tsxy" - $"tsx" * $"tsy") /
            ($"tn" * $"tsxx" - $"tsx" * $"tsx"))
        .withColumn("a", ($"tsy" - $"b" * $"tsx") / $"tn")
        .select($"x".as("quantity"), $"n",
          r4(($"sy" / $"n" - ($"a" + $"b" * $"x")) / 100.0)
            .as("mean_residual"))
        .orderBy($"quantity")
    }),

    // ABC / Pareto classification: parts ranked by exact-cent
    // revenue; cumulative share < 80% = A, < 95% = B, else C. The
    // running revenue uses the distributed range-bucketed
    // runningSums primitive — parts are SF-proportional in TPC-H, so
    // a plain global window would funnel the whole part table
    // through one sort partition. Class boundaries compare integer
    // cross-products (cum*100 vs total*80): no float share decides.
    "q_abc_analysis" -> ((s, d) => {
      import s.implicits._
      val per = T.lineitem(s, d).groupBy($"l_partkey")
        .agg(sum(round($"l_extendedprice" * 100).cast("long")).as("rev_c"))
        .withColumn("neg", -$"rev_c")
      val ranked = graft.operators.Rank.runningSums(
        per, Nil, "neg", Seq("l_partkey"), Seq("cum" -> $"rev_c"))
      ranked
        .withColumn("cls",
          when($"cum" * 100 < $"cum_total" * 80, "A")
            .when($"cum" * 100 < $"cum_total" * 95, "B")
            .otherwise("C"))
        .groupBy($"cls")
        .agg(count(lit(1)).as("n_parts"),
          r4(sum($"rev_c") / 100.0).as("revenue"))
        .orderBy($"cls")
    }),

    // Skewness / excess kurtosis from raw power sums over
    // integral-valued columns (quantity; discount and tax scaled to
    // integer percent) — the sums are exact, the moment algebra sees
    // identical doubles everywhere.
    "q_moments" -> ((s, d) => {
      import s.implicits._
      val cols = Seq(
        ("l_quantity", $"l_quantity".cast("long")),
        ("l_discount_pct", round($"l_discount" * 100).cast("long")),
        ("l_tax_pct", round($"l_tax" * 100).cast("long")))
      val aggs = cols.flatMap { case (nm, c) =>
        Seq(sum(c).as(s"s1_$nm"), sum(c * c).as(s"s2_$nm"),
          sum(c * c * c).as(s"s3_$nm"), sum(c * c * c * c).as(s"s4_$nm"))
      }
      val one = T.lineitem(s, d)
        .agg(count(lit(1)).as("n"), aggs: _*)
      val rows = cols.map { case (nm, _) =>
        val (s1, s2, s3, s4) =
          (col(s"s1_$nm").cast("double"), col(s"s2_$nm").cast("double"),
            col(s"s3_$nm").cast("double"), col(s"s4_$nm").cast("double"))
        val n = col("n").cast("double")
        val mean = s1 / n
        val m2 = s2 / n - mean * mean
        val m3 = s3 / n - lit(3.0) * mean * (s2 / n) +
          lit(2.0) * mean * mean * mean
        val m4 = s4 / n - lit(4.0) * mean * (s3 / n) +
          lit(6.0) * mean * mean * (s2 / n) -
          lit(3.0) * mean * mean * mean * mean
        struct(lit(nm).as("col_name"), r4(mean).as("mean"),
          r4(sqrt(m2)).as("stddev"),
          r4(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2))).as("skewness"),
          r4(m4 / (m2 * m2) - lit(3.0)).as("kurtosis"))
      }
      one.select(explode(array(rows: _*)).as("r")).select("r.*")
        .orderBy($"col_name")
    })
  )

  val oracles: Map[String, String] = Map(
    "ml_kfold" ->
      """WITH m AS (
        |  SELECT CAST(l_orderkey % 5 AS INT) AS fold, count(*) AS n,
        |    sum(CAST(l_quantity AS BIGINT)) AS sx,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
        |    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
        |    sum(CAST(l_quantity AS BIGINT) *
        |        CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |        CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT sum(n) AS tn, sum(sx) AS tsx, sum(sy) AS tsy,
        |    sum(sxx) AS tsxx, sum(sxy) AS tsxy, sum(syy) AS tsyy FROM m),
        |fit AS (
        |  SELECT fold, n, sx, sy, sxx, sxy, syy,
        |    CAST(tn - n AS DOUBLE) AS cn, CAST(tsx - sx AS DOUBLE) AS cx,
        |    CAST(tsy - sy AS DOUBLE) AS cy, CAST(tsxx - sxx AS DOUBLE) AS cxx,
        |    CAST(tsxy - sxy AS DOUBLE) AS cxy
        |  FROM m, tot),
        |ab AS (
        |  SELECT *, (cn * cxy - cx * cy) / (cn * cxx - cx * cx) AS b
        |  FROM fit),
        |ab2 AS (SELECT *, (cy - b * cx) / cn AS a FROM ab)
        |SELECT fold, n AS n_test, round(b, 4) AS slope_c,
        |  round(a / 100.0, 4) AS intercept,
        |  round(sqrt((syy - 2.0*a*sy - 2.0*b*sxy + n*a*a + 2.0*a*b*sx
        |    + b*b*sxx) / n) / 100.0, 4) AS rmse
        |FROM ab2 ORDER BY fold""".stripMargin,

    "ml_learning_curve" ->
      """WITH m AS (
        |  SELECT CAST(l_orderkey % 5 AS INT) AS bucket, count(*) AS n,
        |    sum(CAST(l_quantity AS BIGINT)) AS sx,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
        |    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
        |    sum(CAST(l_quantity AS BIGINT) *
        |        CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |        CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy
        |  FROM lineitem GROUP BY 1),
        |train AS (
        |  SELECT bucket,
        |    CAST(sum(n) OVER w AS DOUBLE) AS cn,
        |    CAST(sum(sx) OVER w AS DOUBLE) AS cx,
        |    CAST(sum(sy) OVER w AS DOUBLE) AS cy,
        |    CAST(sum(sxx) OVER w AS DOUBLE) AS cxx,
        |    CAST(sum(sxy) OVER w AS DOUBLE) AS cxy
        |  FROM m WHERE bucket < 4
        |  WINDOW w AS (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |test AS (
        |  SELECT n AS hn, sx AS hsx, sy AS hsy, sxx AS hsxx,
        |    sxy AS hsxy, syy AS hsyy
        |  FROM m WHERE bucket = 4),
        |fit AS (
        |  SELECT bucket, cn, hn, hsx, hsy, hsxx, hsxy, hsyy,
        |    (cn * cxy - cx * cy) / (cn * cxx - cx * cx) AS b, cx, cy
        |  FROM train, test),
        |fit2 AS (SELECT *, (cy - b * cx) / cn AS a FROM fit)
        |SELECT bucket + 1 AS n_train_buckets,
        |  CAST(cn AS BIGINT) AS train_n, round(b, 4) AS slope_c,
        |  round(sqrt((hsyy - 2.0*a*hsy - 2.0*b*hsxy + hn*a*a
        |    + 2.0*a*b*hsx + b*b*hsxx) / hn) / 100.0, 4) AS holdout_rmse
        |FROM fit2 ORDER BY n_train_buckets""".stripMargin,

    "ml_residual_profile" ->
      """WITH m AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x, count(*) AS n,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy
        |  FROM lineitem GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n) AS DOUBLE) AS tn,
        |    CAST(sum(x * n) AS DOUBLE) AS tsx,
        |    CAST(sum(sy) AS DOUBLE) AS tsy,
        |    CAST(sum(x * x * n) AS DOUBLE) AS tsxx,
        |    CAST(sum(x * sy) AS DOUBLE) AS tsxy
        |  FROM m),
        |fit AS (
        |  SELECT x, n, sy,
        |    (tn * tsxy - tsx * tsy) / (tn * tsxx - tsx * tsx) AS b,
        |    tsx, tsy, tn
        |  FROM m, tot),
        |fit2 AS (SELECT *, (tsy - b * tsx) / tn AS a FROM fit)
        |SELECT x AS quantity, n,
        |  round((sy / n - (a + b * x)) / 100.0, 4) AS mean_residual
        |FROM fit2 ORDER BY quantity""".stripMargin,

    "q_abc_analysis" ->
      """WITH per AS (
        |  SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev_c
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT l_partkey, rev_c,
        |    sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    (SELECT sum(rev_c) FROM per) AS tot
        |  FROM per)
        |SELECT CASE WHEN cum * 100 < tot * 80 THEN 'A'
        |            WHEN cum * 100 < tot * 95 THEN 'B'
        |            ELSE 'C' END AS cls,
        |  count(*) AS n_parts, round(sum(rev_c) / 100.0, 4) AS revenue
        |FROM c GROUP BY 1 ORDER BY cls""".stripMargin,

    "q_ltv_cohort" ->
      """WITH first AS (
        |  SELECT o_custkey AS ck, min(year(o_orderdate)) AS cohort
        |  FROM orders GROUP BY 1),
        |aged AS (
        |  SELECT cohort, year(o_orderdate) - cohort AS age,
        |    count(*) AS n_orders,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
        |  FROM orders JOIN first ON o_custkey = ck
        |  GROUP BY 1, 2)
        |SELECT cohort, age, n_orders,
        |  round(sum(rev_c) OVER (PARTITION BY cohort ORDER BY age)
        |    / 100.0, 4) AS cum_revenue
        |FROM aged ORDER BY cohort, age""".stripMargin,

    "q_moments" -> {
      val cols = Seq(
        ("l_quantity", "CAST(l_quantity AS BIGINT)"),
        ("l_discount_pct", "CAST(round(l_discount * 100) AS BIGINT)"),
        ("l_tax_pct", "CAST(round(l_tax * 100) AS BIGINT)"))
      val rows = cols.map { case (nm, c) =>
        s"""SELECT '$nm' AS col_name,
           |  round(s1/n, 4) AS mean,
           |  round(sqrt(s2/n - (s1/n)*(s1/n)), 4) AS stddev,
           |  round((s3/n - 3.0*(s1/n)*(s2/n) + 2.0*(s1/n)*(s1/n)*(s1/n))
           |    / (sqrt(s2/n - (s1/n)*(s1/n)) * sqrt(s2/n - (s1/n)*(s1/n))
           |       * sqrt(s2/n - (s1/n)*(s1/n))), 4) AS skewness,
           |  round((s4/n - 4.0*(s1/n)*(s3/n) + 6.0*(s1/n)*(s1/n)*(s2/n)
           |    - 3.0*(s1/n)*(s1/n)*(s1/n)*(s1/n))
           |    / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3.0,
           |    4) AS kurtosis
           |FROM (SELECT CAST(count(*) AS DOUBLE) AS n,
           |  CAST(sum($c) AS DOUBLE) AS s1,
           |  CAST(sum($c * $c) AS DOUBLE) AS s2,
           |  CAST(sum($c * $c * $c) AS DOUBLE) AS s3,
           |  CAST(sum($c * $c * $c * $c) AS DOUBLE) AS s4 FROM lineitem)"""
          .stripMargin
      }
      rows.mkString("SELECT * FROM (", " UNION ALL ", ")") +
        " ORDER BY col_name"
    }
  )
}
