package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-native re-expression of the reference's Great Expectations
  * surface (cf. /root/reference/aws_infrastructure/airflow-setup.py:38
  * — the GX config shipped to the Airflow DAGs bucket).
  *
  * Each [[Expectation]] contributes ONE aggregate expression; a whole
  * [[ExpectationSuite]] therefore runs as a SINGLE aggregation pass
  * over the table (map-side partial aggregation, one shuffle of one
  * row per partition) — at 100 TB this is one scan, not one scan per
  * check like the reference's per-expectation pandas evaluation.
  *
  * Conventions: `observed` is a double (violation count for value
  * expectations, the statistic itself for statistic expectations);
  * `success` is 1/0 (long) so the report round-trips engines without
  * boolean-encoding ambiguity.
  */
sealed trait Expectation {
  def name: String
  def column: String
  /** Aggregate expression producing the observed value. */
  def observedAgg: Column
  /** Aggregate producing the denominator `success` compares against.
    * GX evaluates `mostly` over NON-NULL values (nulls are neither
    * conforming nor violating for value expectations), so value
    * expectations count the column; expectations whose predicate
    * ignores the denominator, and not-null (where null IS the
    * violation), use the table row count. */
  def denomAgg: Column = count(lit(1))
  /** Success predicate over (observed value, denominator). */
  def success(observed: Column, denom: Column): Column
}

/** A value-level expectation with GX `mostly` semantics: succeeds when
  * the fraction of conforming NON-NULL values is ≥ `mostly`
  * (equivalently: violations ≤ (1 − mostly)·non-null count — GX's
  * unexpected_percent excludes nulls from its denominator).
  * `mostly = 1.0` (the default) is the strict form — zero violations.
  * Mirrors the fractional tolerances the reference's GX config
  * supports (airflow-setup.py:38). The threshold multiplier is folded
  * in Scala so the oracle SQL can interpolate the identical binary
  * double. */
sealed trait ValueExpectation extends Expectation {
  def mostly: Double
  require(mostly > 0.0 && mostly <= 1.0, s"mostly must be in (0,1]: $mostly")
  override def denomAgg: Column = count(col(column))
  def success(o: Column, denom: Column): Column =
    o <= lit(1.0 - mostly) * denom
}

final case class ExpectNotNull(column: String, mostly: Double = 1.0)
    extends ValueExpectation {
  val name = "expect_not_null"
  // nulls are the violations here, so the `mostly` fraction is over
  // ALL rows — counting only non-nulls would shrink the denominator
  // by exactly the violation count
  override def denomAgg: Column = count(lit(1))
  def observedAgg: Column = sum(when(col(column).isNull, 1L).otherwise(0L))
}

final case class ExpectBetween(column: String, lo: Double, hi: Double,
    mostly: Double = 1.0) extends ValueExpectation {
  val name = "expect_between"
  def observedAgg: Column =
    sum(when(col(column) < lo || col(column) > hi, 1L).otherwise(0L))
}

final case class ExpectInSet(column: String, values: Seq[String],
    mostly: Double = 1.0) extends ValueExpectation {
  val name = "expect_in_set"
  def observedAgg: Column =
    sum(when(col(column).isNotNull && !col(column).isin(values: _*), 1L)
      .otherwise(0L))
}

final case class ExpectUnique(column: String, mostly: Double = 1.0)
    extends ValueExpectation {
  val name = "expect_unique"
  def observedAgg: Column = count(col(column)) - countDistinct(col(column))
}

final case class ExpectRowCountBetween(lo: Long, hi: Long) extends Expectation {
  val name = "expect_row_count_between"
  val column = "*"
  def observedAgg: Column = count(lit(1))
  def success(o: Column, total: Column): Column = o >= lo && o <= hi
}

final case class ExpectMeanBetween(column: String, lo: Double, hi: Double)
    extends Expectation {
  val name = "expect_mean_between"
  def observedAgg: Column = avg(col(column))
  def success(o: Column, total: Column): Column = o >= lo && o <= hi
}

final case class ExpectStddevBetween(column: String, lo: Double, hi: Double)
    extends Expectation {
  val name = "expect_stddev_between"
  def observedAgg: Column = stddev_samp(col(column))
  def success(o: Column, total: Column): Column = o >= lo && o <= hi
}

final case class ExpectLengthsBetween(column: String, lo: Int, hi: Int,
    mostly: Double = 1.0) extends ValueExpectation {
  val name = "expect_lengths_between"
  def observedAgg: Column =
    sum(when(length(col(column)) < lo || length(col(column)) > hi, 1L)
      .otherwise(0L))
}

final case class ExpectMatchRegex(column: String, pattern: String,
    mostly: Double = 1.0) extends ValueExpectation {
  val name = "expect_match_regex"
  def observedAgg: Column =
    sum(when(col(column).isNotNull && !col(column).rlike(pattern), 1L)
      .otherwise(0L))
}

/** GX expect_column_pair_values_a_to_be_greater_than_b: rows where
  * A is not greater than B (>= with `orEqual`) are violations; the
  * `mostly` denominator counts rows where BOTH sides are non-null
  * (GX pair expectations skip rows with a missing side). */
final case class ExpectPairGreater(columnA: String, columnB: String,
    orEqual: Boolean = false, mostly: Double = 1.0) extends ValueExpectation {
  val name = "expect_pair_greater"
  val column = s"$columnA,$columnB"
  override def denomAgg: Column =
    sum(when(col(columnA).isNotNull && col(columnB).isNotNull, 1L)
      .otherwise(0L))
  def observedAgg: Column = {
    val ok = if (orEqual) col(columnA) >= col(columnB)
             else col(columnA) > col(columnB)
    sum(when(col(columnA).isNotNull && col(columnB).isNotNull && !ok, 1L)
      .otherwise(0L))
  }
}

/** GX expect_compound_columns_to_be_unique: duplicate (multi-column)
  * key instances are violations — count minus distinct over the
  * column tuple, one aggregate like everything else in the suite.
  * NULL-bearing tuples are EXCLUDED from both terms explicitly:
  * Spark's multi-column countDistinct skips them while SQL engines'
  * count(DISTINCT (a,b)) counts row-values containing NULL, so
  * pinning the non-null population keeps the observed count
  * engine-independent (and matches GX's any_value_is_missing
  * row-ignore default). */
final case class ExpectCompoundUnique(columns: Seq[String],
    mostly: Double = 1.0) extends ValueExpectation {
  require(columns.size >= 2, "compound uniqueness needs >= 2 columns")
  val name = "expect_compound_unique"
  val column = columns.mkString(",")
  private def allNonNull: Column =
    columns.map(col(_).isNotNull).reduce(_ && _)
  override def denomAgg: Column = count(lit(1))
  def observedAgg: Column =
    count(when(allNonNull, lit(1))) - countDistinct(col(columns.head),
      columns.tail.map(col): _*)
}

/** GX expect_column_median_to_be_between — exact interpolated median
  * as the observed statistic. */
final case class ExpectMedianBetween(column: String, lo: Double, hi: Double)
    extends Expectation {
  val name = "expect_median_between"
  def observedAgg: Column = median(col(column))
  def success(o: Column, total: Column): Column = o >= lo && o <= hi
}

/** GX expect_column_quantile_values_to_be_between, one quantile per
  * expectation (compose several for a range table) — exact
  * interpolated percentile, same definition as DuckDB quantile_cont. */
final case class ExpectQuantileBetween(column: String, q: Double,
    lo: Double, hi: Double) extends Expectation {
  require(q > 0 && q < 1, s"quantile must be in (0,1): $q")
  val name = s"expect_quantile_${q}_between"
  def observedAgg: Column = percentile(col(column), lit(q))
  def success(o: Column, total: Column): Column = o >= lo && o <= hi
}

/** GX expect_column_distinct_values_to_be_in_set: the DISTINCT value
  * set must be a subset — observed counts the distinct values outside
  * the set, success demands zero (no `mostly`: one stray distinct
  * value fails regardless of its row frequency). */
final case class ExpectDistinctInSet(column: String, values: Seq[String])
    extends Expectation {
  val name = "expect_distinct_in_set"
  def observedAgg: Column =
    countDistinct(when(!col(column).isin(values: _*), col(column)))
  def success(o: Column, total: Column): Column = o === 0.0
}

/** GX expect_column_min_to_be_between. */
final case class ExpectMinBetween(column: String, lo: Double, hi: Double)
    extends Expectation {
  val name = "expect_min_between"
  def observedAgg: Column = min(col(column))
  def success(o: Column, total: Column): Column = o >= lo && o <= hi
}

/** GX expect_column_max_to_be_between. */
final case class ExpectMaxBetween(column: String, lo: Double, hi: Double)
    extends Expectation {
  val name = "expect_max_between"
  def observedAgg: Column = max(col(column))
  def success(o: Column, total: Column): Column = o >= lo && o <= hi
}

/** GX expect_column_sum_to_be_between. */
final case class ExpectSumBetween(column: String, lo: Double, hi: Double)
    extends Expectation {
  val name = "expect_sum_between"
  def observedAgg: Column = sum(col(column))
  def success(o: Column, total: Column): Column = o >= lo && o <= hi
}

/** An expectation whose observed statistic needs relational machinery
  * (a total order, adjacent-pair comparison), not a single aggregate
  * expression. Contributes a ONE-ROW (_obs, _den) frame the suite
  * cross-joins onto the single-pass aggregate result — the suite stays
  * one scan for everything aggregable plus one sub-plan per
  * relational check. */
sealed trait RelationalExpectation extends Expectation {
  /** One row, columns (_obs, _den). */
  def evaluate(df: DataFrame): DataFrame
  // never consulted: the suite routes relational expectations
  // through evaluate
  final def observedAgg: Column = throw new UnsupportedOperationException(
    s"$name is evaluated relationally, not as an aggregate")
}

/** GX expect_column_values_to_be_increasing, over an EXPLICIT order
  * column — a distributed table has no file order to inherit, so the
  * check is "when sorted by `orderBy`, each non-null value is ≥ (> for
  * `strictly`) the previous one"; violations are counted pairwise
  * against the immediately preceding row, GX's lag semantics, with the
  * `mostly` denominator the non-null (value, order) row count.
  *
  * Adjacent-pair comparison in a total order is the one GX check no
  * single aggregate expresses, and the naive form —
  * `lag(v).over(Window.orderBy(o))` — plans a SINGLE-PARTITION sort
  * (fatal at 100 TB). Instead: range-bucket the rows on the order
  * column (equal order values always share a bucket, and bucket ids
  * are monotone in it), lag WITHIN buckets — a fully parallel window,
  * every adjacent pair lands inside some bucket except the ≤ buckets−1
  * bucket-edge pairs — and fold those edges from a buckets-sized
  * aggregate of per-bucket first/last (order, value) structs with
  * array HOFs (no window, no join, no rank machinery anywhere).
  * Duplicate rows need no pre-consolidation: equal (order, value)
  * rows sort adjacent inside their bucket, so strict mode counts each
  * duplicate run's internal pairs via the same lag. Ties in `orderBy`
  * are sub-ordered by the value (ascending — the stable-sort choice
  * the oracle's ORDER BY o, v reproduces). */
final case class ExpectIncreasing(column: String, orderBy: String,
    strictly: Boolean = false, mostly: Double = 1.0)
    extends RelationalExpectation {
  require(mostly > 0.0 && mostly <= 1.0, s"mostly must be in (0,1]: $mostly")
  val name: String =
    if (strictly) "expect_increasing_strict" else "expect_increasing"
  def success(o: Column, denom: Column): Column =
    o <= lit(1.0 - mostly) * denom
  def evaluate(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nn = df.filter(col(column).isNotNull && col(orderBy).isNotNull)
      .select(col(orderBy).cast("double").as("_o"),
        col(column).cast("double").as("_v"))
    val bucketed = graft.operators.Rank
      .withRangeBucket(nn, Nil, "_o", buckets = 32)
    def bad(prev: Column, cur: Column): Column =
      if (strictly) cur <= prev else cur < prev
    val wB = Window.partitionBy(col("_bucket"))
      .orderBy(col("_o"), col("_v"))
    // ONE chain: window lag → per-bucket aggregate carrying the
    // within-bucket violation count, row count, AND the bucket's
    // first/last (o, v) structs → a ≤ buckets-row global fold that
    // adds the bucket-edge pairs (last of b vs first of next
    // non-empty b). The groupBy(_bucket) reuses the window's hash
    // partitioning, so the whole check is one shuffle + one scan —
    // the previous shape ran window and edge arms as separate
    // consumers of a checkpointed frame (one more pass + a
    // materialization; measured slower at every size tried).
    val perBucket = bucketed
      .withColumn("_p", lag(col("_v"), 1).over(wB))
      .groupBy(col("_bucket"))
      .agg(coalesce(sum(when(bad(col("_p"), col("_v")), 1L)
        .otherwise(0L)), lit(0L)).as("_wv"),
        count(lit(1)).as("_cnt"),
        min(struct(col("_o"), col("_v"))).as("_f"),
        max(struct(col("_o"), col("_v"))).as("_l"))
    perBucket.groupBy()
      .agg(sort_array(collect_list(struct(
        col("_bucket"), col("_f"), col("_l"), col("_wv"), col("_cnt"))))
        .as("_e"))
      .select(
        (aggregate(col("_e"), lit(0L), (a, x) => a + x.getField("_wv")) +
          when(size(col("_e")) < 2, lit(0L)).otherwise(
            aggregate(zip_with(
              slice(col("_e"), lit(1), size(col("_e")) - 1),
              slice(col("_e"), lit(2), size(col("_e")) - 1),
              (a, b) => when(bad(a.getField("_l").getField("_v"),
                b.getField("_f").getField("_v")), 1L).otherwise(0L)),
              lit(0L), (acc, x) => acc + x))).as("_obs"),
        aggregate(col("_e"), lit(0L), (a, x) => a + x.getField("_cnt"))
          .as("_den"))
  }
}

/** A named suite over one table — the analog of a GX checkpoint. */
final case class ExpectationSuite(table: String, expectations: Seq[Expectation]) {

  /** Run all expectations in one aggregation pass; returns the report
    * DataFrame (table_name, exp_name, col_name, success, observed).
    *
    * One planner trap: when a DISTINCT-based expectation (unique /
    * compound-unique) shares the aggregate with an object-buffer one
    * (median / percentile), Spark's distinct rewrite re-keys the
    * whole aggregate by the distinct columns — and the percentile
    * buffers then ride a per-key exchange (one array buffer per
    * distinct key, ~row count of them) instead of a keyless
    * tree-merge. In that mix the suite splits into two keyless
    * subplans (distinct aggs | everything else) cross-joined on their
    * 1-row results: two pruned columnar scans are far cheaper than
    * one scan whose shuffle carries a buffer per row. */
  def run(df: DataFrame): DataFrame = {
    require(expectations.nonEmpty, "empty suite")
    def isDistinctStyle(e: Expectation): Boolean = e match {
      case _: ExpectUnique | _: ExpectCompoundUnique => true
      case _ => false
    }
    def isObjectAgg(e: Expectation): Boolean = e match {
      case _: ExpectMedianBetween | _: ExpectQuantileBetween => true
      case _ => false
    }
    def aggOf(part: Seq[(Expectation, Int)]): DataFrame = {
      val aggs = part.flatMap { case (e, i) =>
        Seq(e.observedAgg.cast("double").as(s"obs_$i"),
          e.denomAgg.cast("double").as(s"den_$i"))
      }
      df.agg(aggs.head, aggs.tail: _*)
    }
    val indexed = expectations.zipWithIndex
    val (rel, aggable) = indexed.partition {
      case (e, _) => e.isInstanceOf[RelationalExpectation]
    }
    val (dst, rest) = aggable.partition { case (e, _) => isDistinctStyle(e) }
    val aggFrames =
      if (aggable.isEmpty) Nil
      else if (dst.nonEmpty && rest.exists { case (e, _) => isObjectAgg(e) })
        Seq(aggOf(rest), aggOf(dst))
      else Seq(aggOf(aggable))
    val relFrames = rel.map { case (e, i) =>
      e.asInstanceOf[RelationalExpectation].evaluate(df)
        .select(col("_obs").cast("double").as(s"obs_$i"),
          col("_den").cast("double").as(s"den_$i"))
    }
    // every frame is exactly one row, so the chain is scalar composition
    val one = (aggFrames ++ relFrames).reduce(_ crossJoin _)
    val rows = expectations.zipWithIndex.map { case (e, i) =>
      struct(
        lit(table).as("table_name"),
        lit(e.name).as("exp_name"),
        lit(e.column).as("col_name"),
        e.success(col(s"obs_$i"), col(s"den_$i")).cast("long").as("success"),
        round(col(s"obs_$i"), 4).as("observed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Attach the suite's aggregates to a passing-through DataFrame via
    * `df.observe`: the metrics ride along with whatever action the
    * pipeline already executes (accumulator merge, no extra scan) —
    * "validate while you write" instead of a second 100 TB pass.
    * Read results from the returned [[Observation]] after an action:
    * key `obs_i` is expectation i's observed value. */
  def observe(df: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
    require(expectations.nonEmpty, "empty suite")
    require(!expectations.exists(_.isInstanceOf[RelationalExpectation]),
      "relational expectations (expect_increasing) need their own plan " +
        "and cannot ride an observe() accumulator; run() them instead")
    val obs = org.apache.spark.sql.Observation(s"dq_$table")
    val aggs = expectations.zipWithIndex.map { case (e, i) =>
      e.observedAgg.cast("double").as(s"obs_$i")
    }
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Rows of `df` that violate any value-level expectation — the
    * quarantine routing stage of the reference pipeline. */
  def rowPredicate: Column =
    expectations.collect {
      case ExpectNotNull(c, _)        => col(c).isNotNull
      case ExpectBetween(c, lo, hi, _) =>
        col(c).isNull || (col(c) >= lo && col(c) <= hi)
      case ExpectInSet(c, vs, _)      => col(c).isNull || col(c).isin(vs: _*)
      case ExpectLengthsBetween(c, lo, hi, _) =>
        col(c).isNull || (length(col(c)) >= lo && length(col(c)) <= hi)
      case ExpectMatchRegex(c, p, _)  => col(c).isNull || col(c).rlike(p)
      case ExpectPairGreater(a, b, orEq, _) =>
        col(a).isNull || col(b).isNull ||
          (if (orEq) col(a) >= col(b) else col(a) > col(b))
    }.reduceOption(_ && _).getOrElse(lit(true))

  /** Split into (valid, quarantined) without evaluating twice. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter(rowPredicate), df.filter(!rowPredicate))

  /** [[run]] + the failure-notification hook — the GX checkpoint
    * ACTION analog (notify_on_failure): `action` fires EXACTLY ONCE
    * per failed expectation with that expectation's report values,
    * after the one-pass aggregate has computed. Driver-side by
    * design: the report is expectation-count-sized, never data-sized.
    * The returned report is the already-computed rows as a LOCAL
    * frame — identical content to [[run]]'s, no recompute, and the
    * hook cannot perturb it. An action that throws fails the run
    * loudly (a notification that cannot send must not be silent). */
  def runWithActions(df: DataFrame)(
      action: FailedExpectation => Unit): DataFrame = {
    val spark = df.sparkSession
    val report = run(df)
    val rows = report.collect()
    rows.filter(_.getAs[Long]("success") == 0L).foreach { r =>
      action(FailedExpectation(
        r.getAs[String]("table_name"), r.getAs[String]("exp_name"),
        r.getAs[String]("col_name"),
        Option(r.getAs[java.lang.Double]("observed"))
          .fold(Double.NaN)(_.doubleValue)))
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), report.schema)
  }
}

/** One failed expectation as a plain value — what a failure action
  * receives (the GX checkpoint-action payload: which suite, which
  * expectation, which column, what was observed). */
final case class FailedExpectation(tableName: String, expName: String,
    colName: String, observed: Double)
