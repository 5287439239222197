package graft.features

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Point-in-time-correct training-set assembly — the feature-store
  * join. Every supervised pipeline over event data needs label rows
  * enriched with "state of the world strictly before the label's
  * timestamp"; joining feature tables naively leaks the future.
  *
  * The scale-correct implementation is the union trick, not a
  * per-label as-of join: tag label rows and feature events, union,
  * and let ONE per-user window pass forward-fill every feature onto
  * the label rows (labels sort after features at equal timestamps, so
  * "strictly before" holds by construction). One shuffle on user_id
  * total, independent of how many features ride along — a per-feature
  * as-of join would shuffle once per feature table.
  */
object FeatureQueries4 extends QueryModule {

  val queries: Map[String, Q] = Map(
    // Labels: purchase events. Features, all as-of strictly before
    // the purchase: lifetime click count, last observed event value,
    // trailing-7-day activity count.
    "pipe_training_set" -> ((s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val labels = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
          lit(null).cast("double").as("fv"), lit(0L).as("is_click"),
          lit(1).as("is_label"), $"value".as("target"))
      val feats = ev.filter($"event_type" =!= "purchase")
        .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
          $"value".as("fv"),
          ($"event_type" === "click").cast("long").as("is_click"),
          lit(0).as("is_label"), lit(null).cast("double").as("target"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"us", $"is_label", $"event_id")
      val wRange = Window.partitionBy($"user_id").orderBy($"us")
        .rangeBetween(-7L * 86400 * 1000000, 0)
      labels.unionByName(feats)
        .withColumn("n_clicks_before",
          sum($"is_click").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("last_val",
          last($"fv", ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n_7d", count($"fv").over(wRange))
        .filter($"is_label" === 1)
        .select($"user_id", $"event_id", $"us", $"n_clicks_before",
          r4($"last_val").as("last_val"), $"n_7d", r4($"target").as("target"))
        .orderBy($"user_id", $"us", $"event_id")
    }),

    // Frequency (count) encoding of a categorical: each category maps
    // to its occurrence count — vocabulary-free, join back via a
    // category-sized broadcast.
    // Calibration table + Brier score for a linear-probability model
    // of "urgent order" on price — the standard reliability diagnostic
    // (per score decile: mean predicted vs observed positive rate).
    // The fit stays IN the plan (one scalar aggregate, broadcast); the
    // decile assignment rides the distributed Rank primitive on the
    // integer cents key (the ml_lift lesson: double scores make
    // boundary rows engine-dependent, integer ranks never do — the
    // score is monotone in price, so price-rank deciles ARE score
    // deciles).
    "ml_calibration" -> ((s, d) => {
      import s.implicits._
      val o = T.orders(s, d).select($"o_orderkey",
        round($"o_totalprice" * 100).cast("long").as("cents"),
        when($"o_orderpriority" === "1-URGENT", 1.0).otherwise(0.0)
          .as("yl"))
      val fit = o.agg(
        (covar_pop($"yl", $"cents" / 100.0) / var_pop($"cents" / 100.0))
          .as("b"),
        avg($"yl").as("ybar"), avg($"cents" / 100.0).as("xbar"))
      val ranked = graft.operators.Rank.runningSums(
        o, Nil, "cents", Seq("o_orderkey"), Seq("rn" -> lit(1L)))
      ranked
        .withColumn("bin",
          graft.operators.Rank.ntileOf($"rn", $"rn_total", 10))
        .crossJoin(broadcast(fit))
        .withColumn("score", ($"ybar" - $"b" * $"xbar") +
          $"b" * ($"cents" / 100.0))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n"),
          r4(avg($"score")).as("avg_score"),
          r4(avg($"yl")).as("pos_rate"),
          r4(avg(($"score" - $"yl") * ($"score" - $"yl"))).as("brier"))
        .orderBy($"bin")
    }),

    "feat_count_enc" -> ((s, d) => {
      import s.implicits._
      val freq = T.customer(s, d).groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("seg_count"))
      T.customer(s, d)
        .join(broadcast(freq), "c_mktsegment")
        .groupBy($"c_mktsegment", $"seg_count")
        .agg(count(lit(1)).as("n"),
          r4(avg($"c_acctbal")).as("avg_bal"))
        .orderBy($"c_mktsegment")
    })
  )

  val oracles: Map[String, String] = Map(
    "ml_calibration" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderpriority = '1-URGENT'
        |      THEN 1.0 ELSE 0.0 END AS yl
        |  FROM orders),
        |f AS (
        |  SELECT covar_pop(yl, cents/100.0)/var_pop(cents/100.0) AS b,
        |    avg(yl) AS ybar, avg(cents/100.0) AS xbar
        |  FROM o),
        |r AS (
        |  SELECT o.*, ntile(10) OVER (ORDER BY cents, o_orderkey) AS bin
        |  FROM o)
        |SELECT bin, count(*) AS n,
        |  round(avg((ybar - b*xbar) + b*(cents/100.0)), 4) AS avg_score,
        |  round(avg(yl), 4) AS pos_rate,
        |  round(avg(((ybar - b*xbar) + b*(cents/100.0) - yl)
        |          * ((ybar - b*xbar) + b*(cents/100.0) - yl)), 4) AS brier
        |FROM r, f GROUP BY bin ORDER BY bin""".stripMargin,

    "pipe_training_set" ->
      """WITH labels AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CAST(NULL AS DOUBLE) AS fv, CAST(0 AS BIGINT) AS is_click,
        |    1 AS is_label, value AS target
        |  FROM events WHERE event_type = 'purchase'),
        |feats AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    value AS fv,
        |    CAST(event_type = 'click' AS BIGINT) AS is_click,
        |    0 AS is_label, CAST(NULL AS DOUBLE) AS target
        |  FROM events WHERE event_type <> 'purchase'),
        |u AS (SELECT * FROM labels UNION ALL SELECT * FROM feats),
        |enriched AS (
        |  SELECT user_id, event_id, us, is_label, target,
        |    sum(is_click) OVER wr AS n_clicks_before,
        |    last_value(fv IGNORE NULLS) OVER wr AS last_val,
        |    count(fv) OVER wd AS n_7d
        |  FROM u
        |  WINDOW wr AS (PARTITION BY user_id
        |      ORDER BY us, is_label, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wd AS (PARTITION BY user_id ORDER BY us
        |      RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, us,
        |  CAST(n_clicks_before AS BIGINT) AS n_clicks_before,
        |  round(last_val, 4) AS last_val, n_7d, round(target, 4) AS target
        |FROM enriched WHERE is_label = 1
        |ORDER BY user_id, us, event_id""".stripMargin,

    "feat_count_enc" ->
      """WITH freq AS (
        |  SELECT c_mktsegment, count(*) AS seg_count
        |  FROM customer GROUP BY 1)
        |SELECT c_mktsegment, seg_count, count(*) AS n,
        |  round(avg(c_acctbal), 4) AS avg_bal
        |FROM customer JOIN freq USING (c_mktsegment)
        |GROUP BY 1, 2 ORDER BY c_mktsegment""".stripMargin
  )
}
