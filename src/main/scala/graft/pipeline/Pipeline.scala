package graft.pipeline

import graft.quality.ExpectationSuite
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's dynamic-DAG pattern (one Airflow DAG instantiated
  * per dataset config; cf. /root/reference/aws_infrastructure/
  * airflow-setup.py — DAG generator + per-vendor datasets under
  * source_data/datasets/), re-expressed as a pure-Scala pipeline
  * combinator.
  *
  * A [[Stage]] is a named lazy DataFrame transform; a [[Pipeline]]
  * composes them; [[PipelineGenerator]] instantiates one pipeline per
  * dataset config. Nothing executes until an action runs — Catalyst
  * sees the WHOLE per-dataset pipeline as one plan and optimizes
  * across stage boundaries (filter pushdown through the transform
  * stages, etc.), which an orchestrator running stages as separate
  * jobs can never do.
  */
final case class Stage(name: String)(val transform: DataFrame => DataFrame)

final case class Pipeline(name: String, stages: Seq[Stage]) {
  def run(input: DataFrame): DataFrame =
    stages.foldLeft(input)((df, s) => s.transform(df))
  def andThen(s: Stage): Pipeline = copy(stages = stages :+ s)

  /** Like [[run]], but plants an `observe` between stages so per-stage
    * row counts (the Airflow task-log analog) arrive with the ONE
    * action the caller eventually runs — no counting passes, no
    * broken plan fusion: observe is a no-op node for Catalyst, so
    * pushdown still crosses stage boundaries. Read each
    * [[org.apache.spark.sql.Observation]] after the action;
    * key "rows" holds the stage's output row count. */
  def runObserved(input: DataFrame)
      : (DataFrame, Seq[(String, org.apache.spark.sql.Observation)]) = {
    import org.apache.spark.sql.functions._
    val metrics = Seq.newBuilder[(String, org.apache.spark.sql.Observation)]
    val out = stages.foldLeft(input) { (df, s) =>
      val obs = org.apache.spark.sql.Observation(s"$name/${s.name}")
      metrics += s.name -> obs
      s.transform(df).observe(obs, count(lit(1)).as("rows"))
    }
    (out, metrics.result())
  }
}

object Pipeline {
  /** validate → quarantine-filter stage from an expectation suite. */
  def validateStage(suite: ExpectationSuite): Stage =
    Stage(s"validate:${suite.table}")(df => df.filter(suite.rowPredicate))

  /** Per-stage failure routing — the Spark-native analog of the
    * reference DAG's retry/failure args (airflow-setup.py default_args:
    * retries + email_on_failure). An orchestrator reacts to a stage
    * blowing up at runtime; declaratively the same policy is a SPLIT
    * decided per row before the stage runs:
    *  - [[Quarantine]]: violating rows route to a side output, the
    *    stage proceeds on clean rows (the DAG's "quarantine branch"),
    *  - [[Continue]]: violations pass through unfiltered (observe-only
    *    — pair with [[ExpectationSuite.observe]] for the counts),
    *  - [[FailFast]]: any violating row aborts the job at action time
    *    via an in-plan raise (no pre-scan; the check rides the same
    *    pass that would have consumed the row). */
  sealed trait FailurePolicy
  case object Quarantine extends FailurePolicy
  case object Continue extends FailurePolicy
  case object FailFast extends FailurePolicy
}

/** A [[Pipeline]] whose stages carry validation gates with failure
  * routing. `gates` maps stage name → (suite, policy); ungated stages
  * run as-is. Everything stays lazy: quarantine outputs are plain
  * DataFrames sharing the input scan, so Catalyst still optimizes
  * across the whole per-dataset plan. */
final case class GatedPipeline(pipeline: Pipeline,
    gates: Map[String, (ExpectationSuite, Pipeline.FailurePolicy)]) {
  import org.apache.spark.sql.functions._

  /** Returns (final output, per-stage quarantined rows). */
  def run(input: DataFrame): (DataFrame, Seq[(String, DataFrame)]) = {
    val quarantined = Seq.newBuilder[(String, DataFrame)]
    val out = pipeline.stages.foldLeft(input) { (df, s) =>
      val gated = gates.get(s.name) match {
        case Some((suite, Pipeline.Quarantine)) =>
          val (ok, bad) = suite.quarantine(df)
          quarantined += s.name -> bad
          ok
        case Some((suite, Pipeline.FailFast)) =>
          // raise inside the plan: evaluated per row on the pass the
          // stage already makes — violations fail the ACTION, exactly
          // like an Airflow task failing its run.
          df.filter(when(!suite.rowPredicate,
            raise_error(concat(lit(s"[${pipeline.name}/${s.name}] dq violation: "),
              lit(suite.table)))).otherwise(lit(true)))
        case _ => df // Continue or ungated
      }
      s.transform(gated)
    }
    (out, quarantined.result())
  }

  /** Operator-facing alert records — the Airflow failure-notification
    * analog (the reference DAG's default_args wire email_on_failure;
    * here the "notification" is a durable record an operator or a
    * downstream monitor consumes). One row per FAILING expectation at
    * each gated stage:
    *
    *   (pipeline, stage, table_name, exp_name, col_name, policy,
    *    observed)
    *
    * Lazy like everything else: each gated stage contributes its
    * suite's one-pass aggregate filtered to failures, evaluated on
    * the SAME frame the gate sees (post-upstream-transforms,
    * pre-gate), so the alert states exactly what the gate acted on.
    * Empty output = all gates green. Union the result into the
    * dq report artifact sink to persist alerts with the run. */
  def alerts(input: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val perGate = Seq.newBuilder[DataFrame]
    pipeline.stages.foldLeft(input) { (df, s) =>
      gates.get(s.name).foreach { case (suite, policy) =>
        perGate += suite.run(df)
          .filter(col("success") === 0L)
          .select(
            lit(pipeline.name).as("pipeline"), lit(s.name).as("stage"),
            col("table_name"), col("exp_name"), col("col_name"),
            lit(policy.toString).as("policy"), col("observed"))
      }
      val gated = gates.get(s.name) match {
        case Some((suite, Pipeline.Quarantine)) => suite.quarantine(df)._1
        case _ => df
      }
      s.transform(gated)
    }
    val frames = perGate.result()
    if (frames.isEmpty)
      input.sparkSession.emptyDataFrame
        .select(lit("").as("pipeline"), lit("").as("stage"),
          lit("").as("table_name"), lit("").as("exp_name"),
          lit("").as("col_name"), lit("").as("policy"),
          lit(0.0).as("observed")).limit(0)
    else frames.reduce(_.unionAll(_))
  }

  /** [[run]] + the failure-notification hook at the PIPELINE level —
    * the Airflow `email_on_failure` / GX checkpoint-action analog:
    * `action` fires exactly once per failing expectation per gated
    * stage (the [[alerts]] rows), after the pipeline output is
    * built. The data path is untouched — the hook observes, never
    * routes; routing stays the declared [[Pipeline.FailurePolicy]].
    * An action that throws fails the run loudly. */
  def runWithActions(input: DataFrame)(
      action: GatedPipeline.Alert => Unit)
      : (DataFrame, Seq[(String, DataFrame)]) = {
    val out = run(input)
    alerts(input).collect().foreach { r =>
      action(GatedPipeline.Alert(
        r.getAs[String]("pipeline"), r.getAs[String]("stage"),
        r.getAs[String]("table_name"), r.getAs[String]("exp_name"),
        r.getAs[String]("col_name"), r.getAs[String]("policy"),
        Option(r.getAs[java.lang.Double]("observed"))
          .fold(Double.NaN)(_.doubleValue)))
    }
    out
  }
}

object GatedPipeline {
  /** One failing expectation at one gated stage — the payload a
    * pipeline-level failure action receives. */
  final case class Alert(pipeline: String, stage: String,
      tableName: String, expName: String, colName: String,
      policy: String, observed: Double)
}

/** Per-dataset pipeline instantiation — the DAG-generator analog. */
final case class DatasetConfig(name: String, load: SparkSession => DataFrame)

object PipelineGenerator {
  /** One pipeline per dataset; results stay lazy. */
  def generate(spark: SparkSession, datasets: Seq[DatasetConfig],
      build: DatasetConfig => Pipeline): Map[String, DataFrame] =
    datasets.map { cfg =>
      cfg.name -> build(cfg).run(cfg.load(spark))
    }.toMap
}
