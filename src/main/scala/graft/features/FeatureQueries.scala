package graft.features

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import graft.ml.LinearModel
import org.apache.spark.sql.functions._

/** §2.4 — feature engineering + closed-form ML as driver-checkable
  * queries, mirroring the reference pipeline's transform/train/eval
  * stages on the shared corpus. */
object FeatureQueries extends QueryModule {

  private val segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  val queries: Map[String, Q] = Map(
    "feat_onehot" -> ((s, d) => {
      import s.implicits._
      Encoders.oneHot(T.customer(s, d), "c_mktsegment", segments, "seg")
        .select($"c_custkey" +: segments.map(c =>
          col(s"seg_${Encoders.sanitize(c)}")): _*)
        .orderBy($"c_custkey")
    }),

    "feat_datetime" -> ((s, d) => {
      import s.implicits._
      TimeFeatures.expand(T.events(s, d), "ts")
        .select($"event_id", $"hour_of_day", $"dow_iso", $"month_num", $"day_num")
        .orderBy($"event_id")
    }),

    "feat_zscore" -> ((s, d) => {
      import s.implicits._
      Scalers.zscore(T.orders(s, d), "o_totalprice", "z")
        .select($"o_orderkey", r4($"z").as("z_totalprice"))
        .orderBy($"o_orderkey")
    }),

    "feat_minmax" -> ((s, d) => {
      import s.implicits._
      Scalers.minmax(T.orders(s, d), "o_totalprice", "mm")
        .select($"o_orderkey", r4($"mm").as("mm_totalprice"))
        .orderBy($"o_orderkey")
    }),

    "feat_bucketize" -> ((s, d) => {
      import s.implicits._
      Scalers.bucketize(T.orders(s, d), "o_totalprice", 50000.0, "bucket")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), r4(avg($"o_totalprice")).as("avg_price"))
        .orderBy($"bucket")
    }),

    "feat_split" -> ((s, d) => {
      import s.implicits._
      Splits.byKeyModulo(T.orders(s, d), "o_orderkey")
        .groupBy($"split")
        .agg(count(lit(1)).as("n"), r4(sum($"o_totalprice")).as("total"))
        .orderBy($"split")
    }),

    "feat_target_enc" -> ((s, d) => {
      import s.implicits._
      TargetEncoding.encode(T.orders(s, d), "o_orderpriority",
          "o_totalprice", "prio_enc")
        .select($"o_orderkey", $"o_orderpriority", r4($"prio_enc").as("prio_target_enc"))
        .orderBy($"o_orderkey")
    }),

    "ml_linreg" -> ((s, d) => {
      import s.implicits._
      LinearModel.fit(T.lineitem(s, d), "l_quantity", "l_extendedprice",
          "l_returnflag")
        .select($"l_returnflag", r4($"slope").as("slope"),
          r4($"intercept").as("intercept"))
        .orderBy($"l_returnflag")
    }),

    "ml_linreg_multi" -> ((s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
      val xs = Seq("l_quantity", "l_discount")
      val model = LinearModel.fitMulti(li, xs, "l_extendedprice")
      LinearModel.predictMulti(li, model, xs)
        .agg(sqrt(avg(($"l_extendedprice" - $"prediction") *
          ($"l_extendedprice" - $"prediction"))).as("rmse_raw"))
        .select(
          round(lit(model._1), 4).as("intercept"),
          round(lit(model._2.head), 4).as("slope_qty"),
          round(lit(model._2(1)), 4).as("slope_disc"),
          r4($"rmse_raw").as("rmse"))
    }),

    // Hashing-trick categorical encoding — the vocabulary-FREE
    // alternative to feat_onehot's bounded-vocab collect: bucket =
    // hash(feature||value) mod 32, so unseen categories need no
    // refit and driver state is zero at any cardinality (the
    // standard encoder for web-scale categorical features). Hash is
    // the engine-agnostic 60-bit md5 prefix (SimHash's trick), so
    // the oracle replays buckets exactly; the report shows bucket
    // populations plus distinct-value counts (collisions made
    // visible rather than silent).
    "feat_hashed" -> ((s, d) => {
      import s.implicits._
      val src = T.customer(s, d)
        .select(lit("mktsegment").as("feature"),
          $"c_mktsegment".as("value"))
        .unionAll(T.orders(s, d)
          .select(lit("orderpriority").as("feature"),
            $"o_orderpriority".as("value")))
      src.withColumn("bucket",
          pmod(conv(substring(md5(concat($"feature", lit("|"), $"value")),
            1, 15), 16, 10).cast("long"), lit(32)))
        .groupBy($"feature", $"bucket")
        .agg(count(lit(1)).as("n"), countDistinct($"value").as("n_values"))
        .orderBy($"feature", $"bucket")
    }),

    // Ridge with per-sample λ on the covariance diagonal — the same
    // ONE-aggregate distributed pass as ml_linreg_multi, only the
    // driver-side d×d solve changes. With unscaled features the
    // shrinkage is variance-relative: l_discount (var ≈ 1e-3) is
    // crushed toward 0 while l_quantity (var ≈ 2e2) barely moves —
    // the classic "standardize before ridge" caveat, demonstrated.
    "ml_ridge" -> ((s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
      val xs = Seq("l_quantity", "l_discount")
      val model = LinearModel.fitRidge(li, xs, "l_extendedprice",
        lambdaPerN = 0.05)
      LinearModel.predictMulti(li, model, xs)
        .agg(sqrt(avg(($"l_extendedprice" - $"prediction") *
          ($"l_extendedprice" - $"prediction"))).as("rmse_raw"))
        .select(
          round(lit(model._1), 4).as("intercept"),
          round(lit(model._2.head), 4).as("slope_qty"),
          round(lit(model._2(1)), 4).as("slope_disc"),
          r4($"rmse_raw").as("rmse"))
    }),

    "ml_eval" -> ((s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
      val train = li.filter($"l_orderkey" % 5 =!= 0)
      val test = li.filter($"l_orderkey" % 5 === 0)
      val model = LinearModel.fit(train, "l_quantity", "l_extendedprice")
      LinearModel.evaluate(
          LinearModel.predict(test, model, "l_quantity"),
          "l_extendedprice", "prediction")
        .select(r4($"rmse").as("rmse"), r4($"mae").as("mae"), r4($"r2").as("r2"))
    })
  )

  private val segCols = segments.map(c =>
    s"CAST(CASE WHEN c_mktsegment = '$c' THEN 1 ELSE 0 END AS BIGINT) AS seg_${Encoders.sanitize(c)}")
    .mkString(",\n  ")

  val oracles: Map[String, String] = Map(
    "feat_onehot" ->
      s"""SELECT c_custkey,
         |  $segCols
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "feat_datetime" ->
      """SELECT event_id,
        |  CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hour_of_day,
        |  CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow_iso,
        |  CAST(month(CAST(ts AS TIMESTAMP)) AS BIGINT) AS month_num,
        |  CAST(day(CAST(ts AS TIMESTAMP)) AS BIGINT) AS day_num
        |FROM events ORDER BY event_id""".stripMargin,

    "feat_zscore" ->
      """SELECT o_orderkey,
        |  round((o_totalprice - (SELECT avg(o_totalprice) FROM orders))
        |        / (SELECT stddev_samp(o_totalprice) FROM orders), 4) AS z_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "feat_minmax" ->
      """SELECT o_orderkey,
        |  round((o_totalprice - (SELECT min(o_totalprice) FROM orders))
        |        / ((SELECT max(o_totalprice) FROM orders) - (SELECT min(o_totalprice) FROM orders)), 4) AS mm_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "feat_bucketize" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        |  count(*) AS n, round(avg(o_totalprice),4) AS avg_price
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "feat_split" ->
      """SELECT CASE WHEN o_orderkey % 5 = 0 THEN 'test' ELSE 'train' END AS split,
        |  count(*) AS n, round(sum(o_totalprice),4) AS total
        |FROM orders GROUP BY split ORDER BY split""".stripMargin,

    "feat_target_enc" ->
      """SELECT o_orderkey, o_orderpriority,
        |  round(avg(o_totalprice) OVER (PARTITION BY o_orderpriority),4) AS prio_target_enc
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "ml_linreg" ->
      """SELECT l_returnflag,
        |  round(covar_pop(l_extendedprice, l_quantity)/var_pop(l_quantity),4) AS slope,
        |  round(avg(l_extendedprice)
        |        - covar_pop(l_extendedprice, l_quantity)/var_pop(l_quantity)*avg(l_quantity),4) AS intercept
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "ml_linreg_multi" ->
      """WITH s AS (
        |  SELECT covar_pop(l_quantity, l_quantity) AS s11,
        |         covar_pop(l_quantity, l_discount) AS s12,
        |         covar_pop(l_discount, l_discount) AS s22,
        |         covar_pop(l_quantity, l_extendedprice) AS s1y,
        |         covar_pop(l_discount, l_extendedprice) AS s2y,
        |         avg(l_extendedprice) AS my, avg(l_quantity) AS m1,
        |         avg(l_discount) AS m2
        |  FROM lineitem),
        |m AS (
        |  SELECT (s22*s1y - s12*s2y)/(s11*s22 - s12*s12) AS b1,
        |         (s11*s2y - s12*s1y)/(s11*s22 - s12*s12) AS b2,
        |         my, m1, m2
        |  FROM s)
        |SELECT round(m.my - m.b1*m.m1 - m.b2*m.m2, 4) AS intercept,
        |  round(m.b1, 4) AS slope_qty,
        |  round(m.b2, 4) AS slope_disc,
        |  round(sqrt(avg(
        |    (l_extendedprice - ((m.my - m.b1*m.m1 - m.b2*m.m2) + m.b1*l_quantity + m.b2*l_discount))
        |   *(l_extendedprice - ((m.my - m.b1*m.m1 - m.b2*m.m2) + m.b1*l_quantity + m.b2*l_discount)))), 4) AS rmse
        |FROM lineitem, m
        |GROUP BY m.b1, m.b2, m.my, m.m1, m.m2""".stripMargin,

    "feat_hashed" ->
      """WITH src AS (
        |  SELECT 'mktsegment' AS feature, c_mktsegment AS value
        |  FROM customer
        |  UNION ALL
        |  SELECT 'orderpriority', o_orderpriority FROM orders),
        |b AS (
        |  SELECT feature, value,
        |    (('0x' || substr(md5(feature || '|' || value), 1, 15))::BIGINT)
        |      % 32 AS bucket
        |  FROM src)
        |SELECT feature, bucket, count(*) AS n,
        |  count(DISTINCT value) AS n_values
        |FROM b GROUP BY feature, bucket
        |ORDER BY feature, bucket""".stripMargin,

    "ml_ridge" ->
      """WITH s AS (
        |  SELECT covar_pop(l_quantity, l_quantity) + 0.05 AS s11,
        |         covar_pop(l_quantity, l_discount) AS s12,
        |         covar_pop(l_discount, l_discount) + 0.05 AS s22,
        |         covar_pop(l_quantity, l_extendedprice) AS s1y,
        |         covar_pop(l_discount, l_extendedprice) AS s2y,
        |         avg(l_extendedprice) AS my, avg(l_quantity) AS m1,
        |         avg(l_discount) AS m2
        |  FROM lineitem),
        |m AS (
        |  SELECT (s22*s1y - s12*s2y)/(s11*s22 - s12*s12) AS b1,
        |         (s11*s2y - s12*s1y)/(s11*s22 - s12*s12) AS b2,
        |         my, m1, m2
        |  FROM s)
        |SELECT round(m.my - m.b1*m.m1 - m.b2*m.m2, 4) AS intercept,
        |  round(m.b1, 4) AS slope_qty,
        |  round(m.b2, 4) AS slope_disc,
        |  round(sqrt(avg(
        |    (l_extendedprice - ((m.my - m.b1*m.m1 - m.b2*m.m2) + m.b1*l_quantity + m.b2*l_discount))
        |   *(l_extendedprice - ((m.my - m.b1*m.m1 - m.b2*m.m2) + m.b1*l_quantity + m.b2*l_discount)))), 4) AS rmse
        |FROM lineitem, m
        |GROUP BY m.b1, m.b2, m.my, m.m1, m.m2""".stripMargin,

    "ml_eval" ->
      """WITH m AS (
        |  SELECT covar_pop(l_extendedprice, l_quantity)/var_pop(l_quantity) AS slope,
        |         avg(l_extendedprice)
        |         - covar_pop(l_extendedprice, l_quantity)/var_pop(l_quantity)*avg(l_quantity) AS icept
        |  FROM lineitem WHERE l_orderkey % 5 <> 0)
        |SELECT
        |  round(sqrt(avg((l_extendedprice - (m.slope*l_quantity + m.icept))
        |                *(l_extendedprice - (m.slope*l_quantity + m.icept)))),4) AS rmse,
        |  round(avg(abs(l_extendedprice - (m.slope*l_quantity + m.icept))),4) AS mae,
        |  round(1.0 - sum((l_extendedprice - (m.slope*l_quantity + m.icept))
        |                 *(l_extendedprice - (m.slope*l_quantity + m.icept)))
        |            / (var_pop(l_extendedprice) * count(*)), 4) AS r2
        |FROM lineitem, m WHERE l_orderkey % 5 = 0""".stripMargin
  )
}
