package graft.features

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.4b feature/ML extensions: imputation, interaction features,
  * quantile binning, confusion-matrix evaluation, logistic
  * regression, k-means clustering.
  */
object FeatureQueries2 extends QueryModule {

  val queries: Map[String, Q] = Map(
    "feat_impute" -> ((s, d) => {
      import s.implicits._
      // Group-mean imputation: the fill statistic comes from a
      // per-key window aggregate (one shuffle), not a driver pass.
      val ev = T.events(s, d).select($"event_type",
        when($"value" < 2, lit(null)).otherwise($"value").as("v"))
      val w = Window.partitionBy($"event_type")
      ev.withColumn("v_imp", coalesce($"v", avg($"v").over(w)))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum(when($"v".isNull, 1L).otherwise(0L)).as("n_imputed"),
          r4(avg($"v_imp")).as("avg_imputed"))
        .orderBy($"event_type")
    }),

    "feat_interaction" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          r4(avg($"l_quantity" * $"l_extendedprice")).as("qty_price"),
          r4(avg($"l_quantity" * $"l_quantity")).as("qty_sq"),
          r4(avg(log(lit(1.0) + $"l_extendedprice"))).as("log_price"))
        .orderBy($"l_returnflag")
    }),

    "feat_quantile_bin" -> ((s, d) => {
      import s.implicits._
      // Quintile bins WITHIN each status — the window partitions by
      // key, so no global sort; for unkeyed binning at 100 TB use
      // approx-quantile cutpoints instead.
      val w = Window.partitionBy($"o_orderstatus")
        .orderBy($"o_totalprice", $"o_orderkey")
      T.orders(s, d)
        .withColumn("bin",
          least(floor(percent_rank().over(w) * 5), lit(4.0)).cast("long"))
        .groupBy($"o_orderstatus", $"bin")
        .agg(count(lit(1)).as("n"),
          r4(min($"o_totalprice")).as("lo"),
          r4(max($"o_totalprice")).as("hi"))
        .orderBy($"o_orderstatus", $"bin")
    }),

    "ml_confusion" -> ((s, d) => {
      import s.implicits._
      // Rule classifier vs ground truth: confusion counts in one
      // partial-agg pass, metrics derived from the four cells.
      val labeled = T.lineitem(s, d).select(
        ($"l_returnflag" === "R").as("y"),
        ($"l_discount" >= 0.06).as("pred"))
      labeled.agg(
          sum(when($"y" && $"pred", 1L).otherwise(0L)).as("tp"),
          sum(when(!$"y" && $"pred", 1L).otherwise(0L)).as("fp"),
          sum(when($"y" && !$"pred", 1L).otherwise(0L)).as("fn"),
          sum(when(!$"y" && !$"pred", 1L).otherwise(0L)).as("tn"))
        .select($"tp", $"fp", $"fn", $"tn",
          r4($"tp" / ($"tp" + $"fp")).as("prec"),
          r4($"tp" / ($"tp" + $"fn")).as("recall"),
          r4(lit(2.0) * $"tp" / (lit(2.0) * $"tp" + $"fp" + $"fn")).as("f1"))
    }),

    "ml_logreg" -> ((s, d) => {
      // Deterministic full-batch GD (zero init, fixed 6 steps) — the
      // oracle replays the identical iteration as unrolled CTEs, see
      // [[logregOracle]]. LogRegSpec asserts loss decreases and
      // accuracy beats the majority class.
      import s.implicits._
      val li = T.lineitem(s, d)
        .select(($"l_returnflag" === "R").cast("double").as("label"),
          $"l_quantity", $"l_discount", $"l_tax", $"l_extendedprice")
      val fitted = graft.ml.LogReg.fit(li, "label",
        Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice"),
        iters = 6)
      val rows = fitted.weights.map { case (c, v) =>
        (c, BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      } :+ ("__intercept", BigDecimal(fitted.intercept)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      rows.toDF("feature", "coef").orderBy($"feature")
    }),

    "ml_kmeans" -> ((s, d) => {
      // Deterministic k-means over embeddings (fixed init + iteration
      // count) — the oracle replays the same Lloyd's loop as unrolled
      // SQL; cluster sizes + mean cosine-to-centroid per cell
      // (KMeansSpec).
      import s.implicits._
      val emb = T.embeddings(s, d)
      val cents = graft.similarity.KMeans.fit(emb, "vec_id", "embedding",
        k = 8, iters = 3)
      emb.select($"vec_id", $"embedding")
        .withColumn("cell",
          graft.similarity.KMeans.cellExpr($"embedding", cents).cast("long"))
        .withColumn("cos", graft.Util.cosine($"embedding",
          graft.similarity.KMeans.centroidFor($"cell", cents)))
        .groupBy($"cell")
        .agg(count(lit(1)).as("n"), r4(avg($"cos")).as("avg_cos"))
        .orderBy($"cell")
    })
  )

  val oracles: Map[String, String] = Map(
    "feat_impute" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
        |  round(avg(coalesce(v, m)),4) AS avg_imputed
        |FROM (SELECT event_type, v, avg(v) OVER (PARTITION BY event_type) AS m
        |      FROM (SELECT event_type,
        |              CASE WHEN value < 2 THEN NULL ELSE value END AS v
        |            FROM events))
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "feat_interaction" ->
      """SELECT l_returnflag,
        |  round(avg(l_quantity * l_extendedprice),4) AS qty_price,
        |  round(avg(l_quantity * l_quantity),4) AS qty_sq,
        |  round(avg(ln(1.0 + l_extendedprice)),4) AS log_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "feat_quantile_bin" ->
      """SELECT o_orderstatus, bin, count(*) AS n,
        |  round(min(o_totalprice),4) AS lo, round(max(o_totalprice),4) AS hi
        |FROM (SELECT o_orderstatus, o_totalprice,
        |        CAST(least(floor(percent_rank() OVER (
        |          PARTITION BY o_orderstatus
        |          ORDER BY o_totalprice, o_orderkey) * 5), 4) AS BIGINT) AS bin
        |      FROM orders)
        |GROUP BY o_orderstatus, bin ORDER BY o_orderstatus, bin""".stripMargin,

    "ml_confusion" ->
      """SELECT tp, fp, fn, tn,
        |  round(tp / (tp + fp),4) AS prec,
        |  round(tp / (tp + fn),4) AS recall,
        |  round(2.0 * tp / (2.0 * tp + fp + fn),4) AS f1
        |FROM (SELECT
        |  CAST(sum(CASE WHEN l_returnflag = 'R' AND l_discount >= 0.06 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |  CAST(sum(CASE WHEN l_returnflag <> 'R' AND l_discount >= 0.06 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' AND l_discount < 0.06 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |  CAST(sum(CASE WHEN l_returnflag <> 'R' AND l_discount < 0.06 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |FROM lineitem)""".stripMargin,

    "ml_logreg" -> logregOracle(
      Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice"),
      iters = 6, lr = 1.0),

    "ml_kmeans" -> graft.similarity.VectorOracles.kmeansReportSql(
      k = 8, iters = 3)
  )

  /** [[graft.ml.LogReg.fit]] replayed as unrolled CTEs: one
    * (p, gradient, weight-update) triple per GD step. Deterministic
    * (zero init, fixed step count), so the final coefficients
    * hash-match the Spark fit at 4 dp. */
  private def logregOracle(feats: Seq[String], iters: Int,
      lr: Double): String = {
    val n = feats.size
    val is = 0 until n
    val statCols = feats.zipWithIndex.map { case (f, i) =>
      s"avg($f) AS mu_$i, greatest(stddev_pop($f), 1e-12) AS sd_$i"
    }.mkString(", ")
    val xCols = feats.zipWithIndex.map { case (f, i) =>
      s"($f - st.mu_$i) / st.sd_$i AS x_$i"
    }.mkString(", ")
    val xs = is.map(i => s"x_$i").mkString(", ")
    val steps = (1 to iters).flatMap { t =>
      val margin = is.map(i => s"b.x_$i * w.w_$i").mkString(" + ") + " + w.w_b"
      Seq(
        s"""p$t AS (SELECT b.y, $xs,
           |  1.0 / (1.0 + exp(-($margin))) AS p FROM base b, w${t - 1} w)"""
          .stripMargin,
        s"g$t AS (SELECT ${is.map(i => s"avg((p - y) * x_$i) AS g_$i")
          .mkString(", ")}, avg(p - y) AS g_b FROM p$t)",
        s"w$t AS (SELECT ${is.map(i =>
          s"w.w_$i - $lr * g.g_$i AS w_$i").mkString(", ")}, " +
          s"w.w_b - $lr * g.g_b AS w_b FROM w${t - 1} w, g$t g)")
    }
    val stack = feats.zipWithIndex.map { case (f, i) =>
      s"SELECT '$f' AS feature, w_$i AS coef FROM w$iters"
    } :+ s"SELECT '__intercept' AS feature, w_b AS coef FROM w$iters"
    s"""WITH st AS (SELECT $statCols FROM lineitem),
       |base AS (SELECT CAST(l_returnflag = 'R' AS DOUBLE) AS y, $xCols
       |  FROM lineitem, st),
       |w0 AS (SELECT ${is.map(i => s"0.0 AS w_$i").mkString(", ")},
       |  0.0 AS w_b),
       |${steps.mkString(",\n")}
       |SELECT feature, round(coef, 4) + 0 AS coef
       |FROM (${stack.mkString(" UNION ALL ")})
       |ORDER BY feature""".stripMargin
  }
}
