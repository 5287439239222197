package graft.pipeline

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import graft.features.Splits
import graft.ml.LinearModel
import org.apache.spark.sql.functions._

/** §2.4 #56 — the end-to-end per-dataset pipeline (the reference's
  * taxi DAG: ingest → validate → split → train → evaluate), executed
  * per market segment in ONE Spark job and oracled in SQL.
  *
  * "Datasets" here are the 5 customer market segments (standing in
  * for the reference's 3 vendor datasets); the model predicts order
  * totalprice from customer account balance per segment.
  */
object PipelineQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    "pipe_dataset" -> ((s, d) => {
      import s.implicits._
      val joined = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment", $"o_orderkey", $"c_acctbal", $"o_totalprice")
      val split = Splits.byKeyModulo(joined, "o_orderkey")
      val train = split.filter($"split" === "train")
      val test = split.filter($"split" === "test")
      // per-segment fit (one grouped aggregate — the "train" tasks of
      // all 5 dataset DAGs as a single shuffle)
      val models = LinearModel.fit(train, "c_acctbal", "o_totalprice",
        "c_mktsegment")
      // broadcast the 5 fitted models; evaluate on each test split
      test.join(broadcast(models), Seq("c_mktsegment"))
        .withColumn("pred", $"slope" * $"c_acctbal" + $"intercept")
        .groupBy($"c_mktsegment")
        .agg(
          count(lit(1)).as("n_test"),
          r4(sqrt(avg(($"o_totalprice" - $"pred") * ($"o_totalprice" - $"pred")))).as("rmse"),
          r4(avg(abs($"o_totalprice" - $"pred"))).as("mae"))
        .join(broadcast(models.select($"c_mktsegment",
          r4($"slope").as("slope"), r4($"intercept").as("intercept"))),
          Seq("c_mktsegment"))
        .select($"c_mktsegment", $"slope", $"intercept", $"n_test",
          $"rmse", $"mae")
        .orderBy($"c_mktsegment")
    })
  )

  val oracles: Map[String, String] = Map(
    "pipe_dataset" ->
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
        |  FROM train GROUP BY c_mktsegment)
        |SELECT t.c_mktsegment,
        |  round(m.slope, 4) AS slope,
        |  round(m.intercept, 4) AS intercept,
        |  count(*) AS n_test,
        |  round(sqrt(avg((o_totalprice - (m.slope*c_acctbal + m.intercept))
        |                *(o_totalprice - (m.slope*c_acctbal + m.intercept)))), 4) AS rmse,
        |  round(avg(abs(o_totalprice - (m.slope*c_acctbal + m.intercept))), 4) AS mae
        |FROM test t JOIN models m ON t.c_mktsegment = m.c_mktsegment
        |GROUP BY t.c_mktsegment, m.slope, m.intercept
        |ORDER BY t.c_mktsegment""".stripMargin
  )
}
