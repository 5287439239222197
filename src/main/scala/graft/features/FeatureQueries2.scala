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
    }),

    // PCA top principal component of the four line-item numerics:
    // the CORRELATION matrix comes from ONE distributed aggregation
    // pass (six corr() cells; scale-free, so price's 1e5 range can't
    // drown discount's 0.1), then a fixed 50-step power iteration on
    // the 4×4 driver matrix — bounded driver state, same contract as
    // ml_logreg's gradient rows. The iteration count (not a
    // convergence test) IS the pinned spec: the oracle replays the
    // identical 50 normalize steps as a recursive CTE, so both
    // engines walk the same deterministic arithmetic and agree far
    // beyond 4 decimals. Left-assoc sums throughout match SQL's.
    "ml_pca" -> ((s, d) => {
      import s.implicits._
      val feats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for { i <- 0 until 4; j <- i + 1 until 4 } yield (i, j)
      val aggs = pairs.map { case (i, j) =>
        corr(col(feats(i)).cast("double"), col(feats(j)).cast("double"))
          .as(s"c$i$j")
      }
      val row = T.lineitem(s, d).agg(aggs.head, aggs.tail: _*).head()
      val c = Array.tabulate(4, 4)((i, j) => if (i == j) 1.0 else 0.0)
      pairs.zipWithIndex.foreach { case ((i, j), k) =>
        val v = row.getDouble(k); c(i)(j) = v; c(j)(i) = v
      }
      def mul(v: Array[Double]): Array[Double] = Array.tabulate(4)(i =>
        c(i)(0) * v(0) + c(i)(1) * v(1) + c(i)(2) * v(2) + c(i)(3) * v(3))
      var v = Array(0.5, 0.5, 0.5, 0.5)
      for (_ <- 1 to 50) {
        val u = mul(v)
        val n = math.sqrt(u(0) * u(0) + u(1) * u(1) + u(2) * u(2) + u(3) * u(3))
        v = Array(u(0) / n, u(1) / n, u(2) / n, u(3) / n)
      }
      val u = mul(v)
      val lambda = u(0) * v(0) + u(1) * v(1) + u(2) * v(2) + u(3) * v(3)
      feats.zipWithIndex.map { case (f, i) => (f, v(i), lambda) }
        .toDF("feature", "loading0", "eigenvalue0")
        .select($"feature", r4($"loading0").as("loading"),
          r4($"eigenvalue0").as("eigenvalue"))
        .orderBy($"feature")
    })
  )

  val oracles: Map[String, String] = Map(
    // identical 50-step power iteration replayed as a recursive CTE
    // over the engine's own corr() matrix — every multiply/add in the
    // same left-assoc order as the Scala loop
    "ml_pca" ->
      """WITH RECURSIVE c AS (
        |  SELECT corr(l_quantity, l_extendedprice) AS c12,
        |         corr(l_quantity, l_discount) AS c13,
        |         corr(l_quantity, l_tax) AS c14,
        |         corr(l_extendedprice, l_discount) AS c23,
        |         corr(l_extendedprice, l_tax) AS c24,
        |         corr(l_discount, l_tax) AS c34
        |  FROM lineitem),
        |it(k, v1, v2, v3, v4) AS (
        |  -- anchor types fix the recursion's column types: a bare 0.5
        |  -- is DECIMAL(2,1) and every step would round back to it
        |  SELECT 0, CAST(0.5 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |    CAST(0.5 AS DOUBLE), CAST(0.5 AS DOUBLE)
        |  UNION ALL
        |  SELECT k + 1, u1/n, u2/n, u3/n, u4/n
        |  FROM (SELECT k, u1, u2, u3, u4,
        |          sqrt(u1*u1 + u2*u2 + u3*u3 + u4*u4) AS n
        |        FROM (SELECT k,
        |                1.0*v1 + c12*v2 + c13*v3 + c14*v4 AS u1,
        |                c12*v1 + 1.0*v2 + c23*v3 + c24*v4 AS u2,
        |                c13*v1 + c23*v2 + 1.0*v3 + c34*v4 AS u3,
        |                c14*v1 + c24*v2 + c34*v3 + 1.0*v4 AS u4
        |              FROM it, c WHERE k < 50))),
        |fin AS (SELECT * FROM it WHERE k = 50),
        |lam AS (SELECT
        |    (1.0*v1 + c12*v2 + c13*v3 + c14*v4) * v1 +
        |    (c12*v1 + 1.0*v2 + c23*v3 + c24*v4) * v2 +
        |    (c13*v1 + c23*v2 + 1.0*v3 + c34*v4) * v3 +
        |    (c14*v1 + c24*v2 + c34*v3 + 1.0*v4) * v4 AS lambda
        |  FROM fin, c)
        |SELECT f.feature,
        |  round(CASE f.i WHEN 1 THEN v1 WHEN 2 THEN v2
        |                 WHEN 3 THEN v3 ELSE v4 END, 4) AS loading,
        |  round(lambda, 4) AS eigenvalue
        |FROM fin, lam,
        |  (VALUES (1, 'l_quantity'), (2, 'l_extendedprice'),
        |          (3, 'l_discount'), (4, 'l_tax')) AS f(i, feature)
        |ORDER BY feature""".stripMargin,

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
