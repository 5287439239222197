package graft.quality

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._

/** §2.3 — the reference's Great Expectations checkpoint surface as
  * driver-checkable queries. Report schema everywhere:
  * (table_name, exp_name, col_name, success BIGINT, observed DOUBLE).
  */
object DataQualityQueries extends QueryModule {

  private def ordersSuite = ExpectationSuite("orders", Seq(
    ExpectNotNull("o_orderkey"),
    ExpectNotNull("o_custkey"),
    ExpectNotNull("o_totalprice"),
    ExpectNotNull("o_orderdate")))

  private def lineitemBetween = ExpectationSuite("lineitem", Seq(
    ExpectBetween("l_quantity", 1, 50),
    ExpectBetween("l_discount", 0, 0.1),
    ExpectBetween("l_tax", 0, 0.2),
    // GX `mostly` tolerance: ~4.8% of prices exceed 100000 at every
    // sf, so the strict form would fail; mostly=0.9 succeeds — the
    // fractional-tolerance semantics of the reference's GX config.
    ExpectBetween("l_extendedprice", 0, 100000, mostly = 0.9)))

  private def statusSuite = ExpectationSuite("orders", Seq(
    ExpectInSet("o_orderstatus", Seq("F", "O", "P")),
    ExpectInSet("o_orderpriority",
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))))

  private def uniqueSuite = ExpectationSuite("orders", Seq(
    ExpectUnique("o_orderkey"),
    ExpectUnique("o_custkey"))) // intentionally violated: shows failures

  private def statsSuite = ExpectationSuite("lineitem", Seq(
    ExpectMeanBetween("l_quantity", 1, 50),
    ExpectMeanBetween("l_discount", 0, 0.1),
    ExpectStddevBetween("l_quantity", 0, 100)))

  /** The quarantine routing rule (deliberately tight so both routes
    * are non-empty on the synthetic corpus). */
  private def quarantineSuite = ExpectationSuite("lineitem", Seq(
    ExpectBetween("l_quantity", 1, 45),
    ExpectBetween("l_discount", 0, 0.08)))

  /** The full checkpoint: several tables, one report — what the
    * reference's GX validation task emits per dataset. Suites on the
    * same table are merged so each table is scanned ONCE. */
  private def suiteReport(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val ordersAll = ExpectationSuite("orders", ordersSuite.expectations ++
      statusSuite.expectations ++ uniqueSuite.expectations)
    val lineitemAll = ExpectationSuite("lineitem",
      lineitemBetween.expectations ++ statsSuite.expectations)
    ordersAll.run(T.orders(s, d))
      .unionAll(lineitemAll.run(T.lineitem(s, d)))
      .unionAll(ExpectationSuite("customer",
        Seq(ExpectLengthsBetween("c_name", 5, 40))).run(T.customer(s, d)))
  }

  val queries: Map[String, Q] = Map(
    "dq_not_null" -> ((s, d) =>
      ordersSuite.run(T.orders(s, d))
        .orderBy("table_name", "exp_name", "col_name")),

    "dq_between" -> ((s, d) =>
      lineitemBetween.run(T.lineitem(s, d))
        .orderBy("table_name", "exp_name", "col_name")),

    "dq_in_set" -> ((s, d) =>
      statusSuite.run(T.orders(s, d))
        .orderBy("table_name", "exp_name", "col_name")),

    "dq_unique" -> ((s, d) =>
      uniqueSuite.run(T.orders(s, d))
        .orderBy("table_name", "exp_name", "col_name")),

    "dq_row_count" -> ((s, d) =>
      ExpectationSuite("orders", Seq(ExpectRowCountBetween(1L, 1000000000000L)))
        .run(T.orders(s, d))
        .orderBy("table_name", "exp_name", "col_name")),

    "dq_stats" -> ((s, d) =>
      statsSuite.run(T.lineitem(s, d))
        .orderBy("table_name", "exp_name", "col_name")),

    "dq_lengths" -> ((s, d) =>
      ExpectationSuite("customer", Seq(ExpectLengthsBetween("c_name", 5, 40)))
        .run(T.customer(s, d))
        .orderBy("table_name", "exp_name", "col_name")),

    "dq_regex" -> ((s, d) =>
      ExpectationSuite("orders", Seq(
        ExpectMatchRegex("o_orderpriority", "^[1-5]-"),
        ExpectMatchRegex("o_orderstatus", "^[FOP]$")))
        .run(T.orders(s, d))
        .orderBy("table_name", "exp_name", "col_name")),

    "dq_suite" -> ((s, d) =>
      suiteReport(s, d).orderBy("table_name", "exp_name", "col_name")),

    // The reference's checkpoint→data-docs loop: its GX checkpoint
    // persists a per-dataset validation REPORT artifact (the Lambda
    // ships the gx config for exactly this), not just an in-memory
    // result. Same sink discipline as pipe_vendor_artifact — the
    // report is written partitioned by (run_id, dataset), and the
    // RETURNED plan reads only the reloaded artifact, so a later
    // audit job needs no access to the validated tables. Writing the
    // sink is eager by nature (documented, cf. pipe_vendor_artifact);
    // doubles round-trip parquet bit-exactly, so the reloaded report
    // hashes identically to the in-memory one.
    "dq_report_artifact" -> ((s, d) => {
      import s.implicits._
      val dir = sys.props("java.io.tmpdir") + "/graft_dq_reports"
      val report = suiteReport(s, d).withColumnRenamed("table_name", "dataset")
      graft.pipeline.ModelArtifacts.write(
        report, dir, "run_0001", partCols = Seq("dataset"))
      // the GX data-docs analog: a rendered page per dataset inside
      // its partition dir (underscore-prefixed, so reload skips it).
      // Rendered from the RELOADED artifact — a suite-sized parquet
      // read — not from `report`, whose plan would re-run the whole
      // validation aggregate a second time.
      DataDocs.write(
        graft.pipeline.ModelArtifacts.load(s, dir, "run_0001"),
        dir, "run_0001")
      graft.pipeline.ModelArtifacts.load(s, dir, "run_0001")
        .select($"dataset".as("table_name"), $"exp_name", $"col_name",
          $"success", $"observed")
        .orderBy("table_name", "exp_name", "col_name")
    }),

    "dq_quarantine" -> ((s, d) => {
      import s.implicits._
      val (valid, bad) = quarantineSuite.quarantine(T.lineitem(s, d))
      valid.select(lit("valid").as("route"), $"l_extendedprice")
        .unionAll(bad.select(lit("quarantine").as("route"), $"l_extendedprice"))
        .groupBy($"route")
        .agg(count(lit(1)).as("n"), r4(sum($"l_extendedprice")).as("total"))
        .orderBy($"route")
    }),

    // The reference's GX-config-as-artifact pattern end-to-end: the
    // suite is authored as a canonical GX JSON file (the shape the
    // Lambda copies into the DAGs bucket, airflow-setup.py:323-340),
    // loaded through SuiteConfig, and run through the same one-pass
    // aggregate as the Scala-built suites — under the oracle gate, so
    // a loader bug that altered any threshold or dropped a check
    // would hash-mismatch, not just fail a unit spec.
    "dq_suite_config" -> ((s, d) => {
      val f = java.nio.file.Files.createTempFile("graft_suite", ".json")
      java.nio.file.Files.writeString(f,
        """{"expectation_suite_name": "orders", "expectations": [
          |  {"expectation_type": "expect_column_values_to_not_be_null",
          |   "kwargs": {"column": "o_orderkey"}},
          |  {"expectation_type": "expect_column_values_to_not_be_null",
          |   "kwargs": {"column": "o_custkey"}},
          |  {"expectation_type": "expect_column_values_to_not_be_null",
          |   "kwargs": {"column": "o_totalprice"}},
          |  {"expectation_type": "expect_column_values_to_not_be_null",
          |   "kwargs": {"column": "o_orderdate"}},
          |  {"expectation_type": "expect_column_values_to_be_in_set",
          |   "kwargs": {"column": "o_orderstatus", "value_set": ["F","O","P"]}},
          |  {"expectation_type": "expect_column_values_to_be_in_set",
          |   "kwargs": {"column": "o_orderpriority", "value_set":
          |     ["1-URGENT","2-HIGH","3-MEDIUM","4-NOT SPECIFIED","5-LOW"]}},
          |  {"expectation_type": "expect_column_values_to_be_unique",
          |   "kwargs": {"column": "o_orderkey"}},
          |  {"expectation_type": "expect_column_values_to_be_unique",
          |   "kwargs": {"column": "o_custkey"}}
          |]}""".stripMargin)
      try SuiteConfig.load(s, f.toString).run(T.orders(s, d))
        .orderBy("table_name", "exp_name", "col_name")
      finally java.nio.file.Files.delete(f)
    }),

    // The extended GX families: pair comparison, compound-key
    // uniqueness, median/quantile statistics, distinct-set subset —
    // one aggregation pass per table like every other suite. Three
    // checks REALLY fail on this corpus (tax>discount holds on only
    // ~44% of lines so mostly=0.5 misses; (orderkey, linenumber) has
    // genuine duplicates; priorities exceed the 1-3 set), so the
    // report carries both success values.
    "dq_advanced" -> ((s, d) => {
      val li = ExpectationSuite("lineitem", Seq(
        ExpectPairGreater("l_extendedprice", "l_discount"),
        ExpectPairGreater("l_tax", "l_discount", orEqual = false, mostly = 0.5),
        ExpectCompoundUnique(Seq("l_orderkey", "l_linenumber")),
        ExpectMedianBetween("l_quantity", 20, 30),
        ExpectQuantileBetween("l_quantity", 0.9, 40, 50)))
      val ord = ExpectationSuite("orders", Seq(
        ExpectDistinctInSet("o_orderstatus", Seq("F", "O", "P")),
        ExpectDistinctInSet("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM")))) // fails: 2 extra
      li.run(T.lineitem(s, d)).unionAll(ord.run(T.orders(s, d)))
        .orderBy("table_name", "exp_name", "col_name")
    }),

    // GX long tail: min/max/sum statistic gates (one aggregate each,
    // riding the same single-pass suite) and the order-dependent
    // expect_column_values_to_be_increasing — the one GX check that
    // needs a total order, evaluated through the distributed Rank
    // primitive (see ExpectIncreasing), never a single-partition
    // window sort. The orders check passes (o_orderkey is strictly
    // increasing by itself); the lineitem check fails with a genuine
    // pairwise-lag violation count — the report carries both.
    // Statistics chosen exact (min/max pick values; l_quantity sums
    // are integral) so the driver's hash compare is safe.
    "dq_advanced2" -> ((s, d) => {
      // No checkpoint: a materialized 2-column projection was
      // measured WORSE (1.55 vs 1.30 s at sf0.1) than letting each
      // arm re-run the cheap pruned vectorized scan — the same
      // lesson q_spearman's plan history records. The win is inside
      // ExpectIncreasing instead: its window and edge arms are fused
      // into one chain (see evaluate), so the relational check costs
      // two scans, not three plus a materialization.
      val liProj = T.lineitem(s, d)
        .select(col("l_quantity"), col("l_orderkey"))
      val ordProj = T.orders(s, d)
        .select(col("o_totalprice"), col("o_orderkey"))
      val li = ExpectationSuite("lineitem", Seq(
        ExpectMinBetween("l_quantity", 1, 1),
        ExpectMaxBetween("l_quantity", 50, 50),
        ExpectSumBetween("l_quantity", 1, 1e9),
        ExpectIncreasing("l_quantity", "l_orderkey")))
      val ord = ExpectationSuite("orders", Seq(
        ExpectMinBetween("o_totalprice", 0, 1000),
        ExpectMaxBetween("o_totalprice", 0, 600000),
        ExpectIncreasing("o_orderkey", "o_orderkey", strictly = true)))
      li.run(liProj).unionAll(ord.run(ordProj))
        .orderBy("table_name", "exp_name", "col_name")
    }),

    // Referential integrity — orphan foreign keys per relationship,
    // the cross-table DQ dimension single-table expectations can't
    // see. Each check is one left-anti join against the parent's key
    // set (broadcast when dimension-sized).
    "dq_referential" -> ((s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
      def orphans(name: String, fk: org.apache.spark.sql.DataFrame,
          fkCol: String, pk: org.apache.spark.sql.DataFrame,
          pkCol: String) = {
        val o = fk.join(pk.select(col(pkCol)), col(fkCol) === col(pkCol),
          "left_anti")
        o.agg(count(lit(1)).as("n_orphans"))
          .select(lit(name).as("relation"), $"n_orphans",
            ($"n_orphans" === 0).cast("long").as("intact"))
      }
      orphans("lineitem.l_orderkey->orders", li.select($"l_orderkey"),
          "l_orderkey", T.orders(s, d), "o_orderkey")
        .unionAll(orphans("lineitem.l_partkey->part", li.select($"l_partkey"),
          "l_partkey", T.part(s, d), "p_partkey"))
        .unionAll(orphans("lineitem.l_suppkey->supplier",
          li.select($"l_suppkey"), "l_suppkey", T.supplier(s, d), "s_suppkey"))
        .unionAll(orphans("orders.o_custkey->customer",
          T.orders(s, d).select($"o_custkey"), "o_custkey",
          T.customer(s, d), "c_custkey"))
        .orderBy($"relation")
    }),

    // Null-rate profile — every column of a table in one aggregation
    // pass (count(col) skips nulls), exploded to a row per column:
    // the table-wide completeness overview a profiler emits before
    // anyone writes per-column expectations.
    "dq_null_profile" -> ((s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      val cols = o.schema.fieldNames.toSeq
      val aggs = count(lit(1)).as("n_rows") +:
        cols.map(c => count(col(c)).as(s"nn_$c"))
      val one = o.agg(aggs.head, aggs.tail: _*)
      val rows = cols.map { c =>
        struct(lit(c).as("col_name"),
          ($"n_rows" - col(s"nn_$c")).as("n_null"),
          expr(s"((n_rows - nn_$c) * 20000 + n_rows) div (2 * n_rows)")
            .as("null_bp"))
      }
      one.select(explode(array(rows: _*)).as("r")).select("r.*")
        .orderBy($"col_name")
    }),

    // Freshness — the DQ dimension the expectation families don't
    // cover: per event type, how far its newest record lags the
    // newest record overall, flagged stale past 24h. The global max
    // is a 1-row broadcast; integer microseconds end to end.
    // Primary/business-key duplication audit across relations: row
    // count vs distinct-key count and the worst key's multiplicity —
    // the "is this column actually a key" report (dq_unique asserts
    // ONE declared key; this profiles several at once). One pass per
    // relation, partial-agg counts only.
    "dq_dup_profile" -> ((s, d) => {
      import s.implicits._
      def profile(df: org.apache.spark.sql.DataFrame, rel: String,
          key: String) =
        df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
          .agg(lit(rel).as("relation"), lit(key).as("key_col"),
            sum($"c").as("n_rows"),
            count(lit(1)).as("n_keys"),
            max($"c").as("max_multiplicity"),
            graft.Util.r4((sum($"c") - count(lit(1))).cast("double") /
              sum($"c")).as("dup_rate"))
      profile(T.orders(s, d), "orders", "o_orderkey")
        .unionByName(profile(T.lineitem(s, d), "lineitem", "l_orderkey"))
        .unionByName(profile(T.events(s, d), "events", "user_id"))
        .orderBy($"relation")
    }),

    // Join/shuffle-key skew audit — find the hot key BEFORE the
    // shuffle does: per candidate key column, the distinct count and
    // the heaviest value's share. One multi-distinct pass for the
    // cardinalities; per-column top values shuffle only (value, count)
    // partials. The 30%-hot-key probes (BASELINE.md) are exactly what
    // this report exists to catch in production tables.
    "dq_skew_profile" -> ((s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
      val cols = Seq("l_returnflag", "l_suppkey", "l_orderkey")
      val card = li.agg(count(lit(1)).as("total"),
        countDistinct($"l_returnflag").as("d_l_returnflag"),
        countDistinct($"l_suppkey").as("d_l_suppkey"),
        countDistinct($"l_orderkey").as("d_l_orderkey"))
      val tops = cols.map { c =>
        li.groupBy(col(c).cast("string").as("top_value"))
          .agg(count(lit(1)).as("top_n"))
          .orderBy($"top_n".desc, $"top_value")
          .limit(1)
          .select(lit(c).as("col_name"), $"top_value", $"top_n")
      }.reduce(_ unionByName _)
      tops.crossJoin(broadcast(card))
        .select($"col_name",
          when($"col_name" === "l_returnflag", $"d_l_returnflag")
            .when($"col_name" === "l_suppkey", $"d_l_suppkey")
            .otherwise($"d_l_orderkey").as("n_distinct"),
          $"top_value", $"top_n",
          graft.Util.r4($"top_n" / $"total").as("top_share"))
        .orderBy($"col_name")
    }),

    "dq_freshness" -> ((s, d) => {
      import s.implicits._
      val perType = T.events(s, d)
        .groupBy($"event_type").agg(max(unix_micros($"ts")).as("max_us"))
      val global = perType.agg(max($"max_us").as("g_us"))
      perType.crossJoin(broadcast(global))
        .select($"event_type",
          expr("(g_us - max_us) div 1000000").as("lag_sec"),
          ($"g_us" - $"max_us" <= 86400L * 1000000).cast("long").as("fresh"))
        .orderBy($"event_type")
    }),

    // Volume anomaly — daily row counts vs the trailing 7-day mean
    // (current day excluded); days under half the trailing mean are
    // flagged. The integer cross-multiplication (2*7*n < sum) keeps
    // the comparison float-free.
    "dq_volume_anomaly" -> ((s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy(unix_timestamp(date_trunc("day", $"ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"day").rowsBetween(-7, -1)
      daily
        .withColumn("t_n", count($"n").over(w))
        .withColumn("t_sum", sum($"n").over(w))
        .filter($"t_n" === 7)
        .select($"day", $"n",
          expr("(t_sum * 2 + 7) div 14").as("trail_mean"),
          ($"n" * 14 < $"t_sum").cast("long").as("anomaly"))
        .orderBy($"day")
    }),

    "dq_schema" -> ((s, d) => {
      import s.implicits._
      // rows-only: declared-vs-actual schema conformance
      val expected = Seq(
        ("o_orderkey", "bigint"), ("o_custkey", "bigint"),
        ("o_orderstatus", "string"), ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"), ("o_orderpriority", "string"))
      val actual = T.orders(s, d).schema.fields
        .map(f => (f.name, f.dataType.simpleString)).toSeq
      val exp = expected.toDF("col_name", "expected_type")
      val act = actual.toDF("col_name", "actual_type")
      exp.join(act, Seq("col_name"), "full_outer")
        .withColumn("success",
          (col("expected_type") === col("actual_type")).cast("long"))
        .orderBy("col_name")
    })
  )

  private def obsRow(table: String, exp: String, col: String,
      obsSql: String, successSql: String, from: String): String =
    s"""SELECT '$table' AS table_name, '$exp' AS exp_name, '$col' AS col_name,
       |  CAST($successSql AS BIGINT) AS success,
       |  round(CAST($obsSql AS DOUBLE), 4) AS observed FROM $from""".stripMargin

  private def violRow(table: String, exp: String, col: String,
      violSql: String): String =
    obsRow(table, exp, col, violSql, s"CASE WHEN $violSql = 0 THEN 1 ELSE 0 END", table)

  private def notNullRow(t: String, c: String) =
    violRow(t, "expect_not_null", c, s"count(*) - count($c)")
  private def betweenRow(t: String, c: String, lo: Double, hi: Double) =
    violRow(t, "expect_between", c,
      s"sum(CASE WHEN $c < $lo OR $c > $hi THEN 1 ELSE 0 END)")
  /** `mostly` form: success ⇔ violations ≤ (1 − mostly)·non-null
    * count (GX semantics; see ValueExpectation). The threshold is
    * folded to a double in SCALA and interpolated with an explicit
    * CAST — `(1.0 - 0.9)` left to DuckDB would evaluate in DECIMAL to
    * exactly 0.1, while Spark computes the binary double
    * 0.09999999…, and at a violations == threshold boundary the two
    * engines would then disagree on `success`. */
  private def betweenMostlyRow(t: String, c: String, lo: Double, hi: Double,
      mostly: Double) = {
    val viol = s"sum(CASE WHEN $c < $lo OR $c > $hi THEN 1 ELSE 0 END)"
    obsRow(t, "expect_between", c, viol,
      s"CASE WHEN $viol <= CAST(${1.0 - mostly} AS DOUBLE) * count($c) " +
        "THEN 1 ELSE 0 END", t)
  }
  private def inSetRow(t: String, c: String, vs: Seq[String]) =
    violRow(t, "expect_in_set", c,
      s"sum(CASE WHEN $c IS NOT NULL AND $c NOT IN (${vs.map("'" + _ + "'").mkString(",")}) THEN 1 ELSE 0 END)")
  private def uniqueRow(t: String, c: String) =
    violRow(t, "expect_unique", c, s"count($c) - count(DISTINCT $c)")
  private def meanRow(t: String, c: String, lo: Double, hi: Double) =
    obsRow(t, "expect_mean_between", c, s"avg($c)",
      s"CASE WHEN avg($c) >= $lo AND avg($c) <= $hi THEN 1 ELSE 0 END", t)
  private def stddevRow(t: String, c: String, lo: Double, hi: Double) =
    obsRow(t, "expect_stddev_between", c, s"stddev_samp($c)",
      s"CASE WHEN stddev_samp($c) >= $lo AND stddev_samp($c) <= $hi THEN 1 ELSE 0 END", t)
  private def lengthsRow(t: String, c: String, lo: Int, hi: Int) =
    violRow(t, "expect_lengths_between", c,
      s"sum(CASE WHEN length($c) < $lo OR length($c) > $hi THEN 1 ELSE 0 END)")
  private def regexRow(t: String, c: String, pat: String) =
    violRow(t, "expect_match_regex", c,
      s"sum(CASE WHEN $c IS NOT NULL AND NOT regexp_matches($c, '$pat') THEN 1 ELSE 0 END)")
  private def rowCountRow(t: String, lo: Long, hi: Long) =
    obsRow(t, "expect_row_count_between", "*", "count(*)",
      s"CASE WHEN count(*) >= $lo AND count(*) <= $hi THEN 1 ELSE 0 END", t)
  private def pairGreaterRow(t: String, a: String, b: String,
      mostly: Double) = {
    val viol = s"sum(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL " +
      s"AND NOT ($a > $b) THEN 1 ELSE 0 END)"
    val denom = s"sum(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL " +
      "THEN 1 ELSE 0 END)"
    obsRow(t, "expect_pair_greater", s"$a,$b", viol,
      s"CASE WHEN $viol <= CAST(${1.0 - mostly} AS DOUBLE) * $denom " +
        "THEN 1 ELSE 0 END", t)
  }
  private def compoundUniqueRow(t: String, cols: Seq[String]) = {
    val tup = cols.mkString("(", ", ", ")")
    // both terms filtered to the all-non-null population, mirroring
    // the Spark side (DuckDB's DISTINCT counts NULL-bearing tuples,
    // Spark's countDistinct excludes them)
    val nn = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    violRow(t, "expect_compound_unique", cols.mkString(","),
      s"count(*) FILTER ($nn) - count(DISTINCT $tup) FILTER ($nn)")
  }
  private def medianRow(t: String, c: String, lo: Double, hi: Double) =
    obsRow(t, "expect_median_between", c, s"median($c)",
      s"CASE WHEN median($c) >= $lo AND median($c) <= $hi THEN 1 ELSE 0 END", t)
  private def quantileRow(t: String, c: String, q: Double, lo: Double,
      hi: Double) =
    obsRow(t, s"expect_quantile_${q}_between", c, s"quantile_cont($c, $q)",
      s"CASE WHEN quantile_cont($c, $q) >= $lo AND " +
        s"quantile_cont($c, $q) <= $hi THEN 1 ELSE 0 END", t)
  private def minRow(t: String, c: String, lo: Double, hi: Double) =
    obsRow(t, "expect_min_between", c, s"min($c)",
      s"CASE WHEN min($c) >= $lo AND min($c) <= $hi THEN 1 ELSE 0 END", t)
  private def maxRow(t: String, c: String, lo: Double, hi: Double) =
    obsRow(t, "expect_max_between", c, s"max($c)",
      s"CASE WHEN max($c) >= $lo AND max($c) <= $hi THEN 1 ELSE 0 END", t)
  private def sumRow(t: String, c: String, lo: Double, hi: Double) =
    obsRow(t, "expect_sum_between", c, s"sum($c)",
      s"CASE WHEN sum($c) >= $lo AND sum($c) <= $hi THEN 1 ELSE 0 END", t)
  /** Pairwise-lag increasing check: the oracle IS the naive window
    * form (ORDER BY order-col, value — the same tie order the Spark
    * side's stable decomposition uses), so it pins the distributed
    * rank+self-join evaluation to lag semantics exactly. */
  private def increasingRow(t: String, c: String, o: String,
      strictly: Boolean) = {
    val name = if (strictly) "expect_increasing_strict" else "expect_increasing"
    val cmp = if (strictly) "<=" else "<"
    val viol = s"sum(CASE WHEN _v $cmp _prev THEN 1 ELSE 0 END)"
    s"""SELECT '$t' AS table_name, '$name' AS exp_name, '$c' AS col_name,
       |  CAST(CASE WHEN coalesce($viol, 0) = 0 THEN 1 ELSE 0 END AS BIGINT)
       |    AS success,
       |  round(CAST(coalesce($viol, 0) AS DOUBLE), 4) AS observed
       |FROM (SELECT CAST($c AS DOUBLE) AS _v,
       |        lag(CAST($c AS DOUBLE)) OVER (ORDER BY $o, $c) AS _prev
       |      FROM $t WHERE $c IS NOT NULL AND $o IS NOT NULL)""".stripMargin
  }

  private def distinctInSetRow(t: String, c: String, vs: Seq[String]) = {
    val set = vs.map("'" + _ + "'").mkString(",")
    val obs = s"count(DISTINCT CASE WHEN $c NOT IN ($set) THEN $c END)"
    obsRow(t, "expect_distinct_in_set", c, obs,
      s"CASE WHEN $obs = 0 THEN 1 ELSE 0 END", t)
  }

  private val ordersNotNullRows = Seq(
    notNullRow("orders", "o_orderkey"), notNullRow("orders", "o_custkey"),
    notNullRow("orders", "o_totalprice"), notNullRow("orders", "o_orderdate"))
  private val lineitemBetweenRows = Seq(
    betweenRow("lineitem", "l_quantity", 1, 50),
    betweenRow("lineitem", "l_discount", 0, 0.1),
    betweenRow("lineitem", "l_tax", 0, 0.2),
    betweenMostlyRow("lineitem", "l_extendedprice", 0, 100000, 0.9))
  private val statusRows = Seq(
    inSetRow("orders", "o_orderstatus", Seq("F", "O", "P")),
    inSetRow("orders", "o_orderpriority",
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))
  private val uniqueRows = Seq(
    uniqueRow("orders", "o_orderkey"), uniqueRow("orders", "o_custkey"))
  private val statsRows = Seq(
    meanRow("lineitem", "l_quantity", 1, 50),
    meanRow("lineitem", "l_discount", 0, 0.1),
    stddevRow("lineitem", "l_quantity", 0, 100))
  private val lengthsRows = Seq(lengthsRow("customer", "c_name", 5, 40))

  private def u(rows: Seq[String]): String =
    rows.mkString("SELECT * FROM (", " UNION ALL ", ")") +
      " ORDER BY table_name, exp_name, col_name"

  val oracles: Map[String, String] = Map(
    "dq_not_null" -> u(ordersNotNullRows),
    "dq_between" -> u(lineitemBetweenRows),
    "dq_in_set" -> u(statusRows),
    "dq_unique" -> u(uniqueRows),
    "dq_row_count" -> u(Seq(rowCountRow("orders", 1L, 1000000000000L))),
    "dq_stats" -> u(statsRows),
    "dq_lengths" -> u(lengthsRows),
    "dq_regex" -> u(Seq(
      regexRow("orders", "o_orderpriority", "^[1-5]-"),
      regexRow("orders", "o_orderstatus", "^[FOP]$"))),
    "dq_suite" -> u(ordersNotNullRows ++ statusRows ++ uniqueRows ++
      lineitemBetweenRows ++ statsRows ++ lengthsRows),
    // the JSON-authored suite is the orders subset of dq_suite — the
    // loader must reproduce it check-for-check
    "dq_suite_config" -> u(ordersNotNullRows ++ statusRows ++ uniqueRows),
    // artifact round-trip is value-preserving → same oracle as dq_suite
    "dq_report_artifact" -> u(ordersNotNullRows ++ statusRows ++ uniqueRows ++
      lineitemBetweenRows ++ statsRows ++ lengthsRows),
    "dq_referential" ->
      """SELECT * FROM (
        |  SELECT 'lineitem.l_orderkey->orders' AS relation,
        |    count(*) FILTER (o_orderkey IS NULL) AS n_orphans,
        |    CAST(count(*) FILTER (o_orderkey IS NULL) = 0 AS BIGINT) AS intact
        |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part',
        |    count(*) FILTER (p_partkey IS NULL),
        |    CAST(count(*) FILTER (p_partkey IS NULL) = 0 AS BIGINT)
        |  FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->supplier',
        |    count(*) FILTER (s_suppkey IS NULL),
        |    CAST(count(*) FILTER (s_suppkey IS NULL) = 0 AS BIGINT)
        |  FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer',
        |    count(*) FILTER (c_custkey IS NULL),
        |    CAST(count(*) FILTER (c_custkey IS NULL) = 0 AS BIGINT)
        |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey)
        |ORDER BY relation""".stripMargin,

    "dq_null_profile" ->
      """WITH a AS (SELECT count(*) AS n_rows,
        |    count(o_orderkey) AS nn_o_orderkey,
        |    count(o_custkey) AS nn_o_custkey,
        |    count(o_orderstatus) AS nn_o_orderstatus,
        |    count(o_totalprice) AS nn_o_totalprice,
        |    count(o_orderdate) AS nn_o_orderdate,
        |    count(o_orderpriority) AS nn_o_orderpriority
        |  FROM orders)
        |SELECT col_name, n_null,
        |  (n_null * 20000 + n_rows) // (2 * n_rows) AS null_bp
        |FROM (
        |  SELECT 'o_orderkey' AS col_name,
        |    n_rows - nn_o_orderkey AS n_null, n_rows FROM a
        |  UNION ALL SELECT 'o_custkey', n_rows - nn_o_custkey, n_rows FROM a
        |  UNION ALL SELECT 'o_orderstatus', n_rows - nn_o_orderstatus,
        |    n_rows FROM a
        |  UNION ALL SELECT 'o_totalprice', n_rows - nn_o_totalprice,
        |    n_rows FROM a
        |  UNION ALL SELECT 'o_orderdate', n_rows - nn_o_orderdate,
        |    n_rows FROM a
        |  UNION ALL SELECT 'o_orderpriority', n_rows - nn_o_orderpriority,
        |    n_rows FROM a)
        |ORDER BY col_name""".stripMargin,

    "dq_dup_profile" ->
      """WITH p AS (
        |  SELECT 'orders' AS relation, 'o_orderkey' AS key_col,
        |    count(*) AS n_rows, count(DISTINCT o_orderkey) AS n_keys,
        |    max(c) AS max_multiplicity
        |  FROM orders, (SELECT max(cnt) AS c FROM (
        |    SELECT count(*) AS cnt FROM orders GROUP BY o_orderkey))
        |  GROUP BY c
        |  UNION ALL
        |  SELECT 'lineitem', 'l_orderkey', count(*),
        |    count(DISTINCT l_orderkey), max(c)
        |  FROM lineitem, (SELECT max(cnt) AS c FROM (
        |    SELECT count(*) AS cnt FROM lineitem GROUP BY l_orderkey))
        |  GROUP BY c
        |  UNION ALL
        |  SELECT 'events', 'user_id', count(*),
        |    count(DISTINCT user_id), max(c)
        |  FROM events, (SELECT max(cnt) AS c FROM (
        |    SELECT count(*) AS cnt FROM events GROUP BY user_id))
        |  GROUP BY c)
        |SELECT relation, key_col, n_rows, n_keys,
        |  CAST(max_multiplicity AS BIGINT) AS max_multiplicity,
        |  round(CAST(n_rows - n_keys AS DOUBLE) / n_rows, 4) AS dup_rate
        |FROM p ORDER BY relation""".stripMargin,

    "dq_skew_profile" ->
      """WITH card AS (
        |  SELECT count(*) AS total,
        |    count(DISTINCT l_returnflag) AS d_rf,
        |    count(DISTINCT l_suppkey) AS d_sk,
        |    count(DISTINCT l_orderkey) AS d_ok
        |  FROM lineitem),
        |tops AS (
        |  SELECT 'l_returnflag' AS col_name, d_rf AS n_distinct,
        |    top_value, top_n FROM card, (
        |    SELECT CAST(l_returnflag AS VARCHAR) AS top_value,
        |      count(*) AS top_n
        |    FROM lineitem GROUP BY 1 ORDER BY top_n DESC, top_value LIMIT 1)
        |  UNION ALL
        |  SELECT 'l_suppkey', d_sk, top_value, top_n FROM card, (
        |    SELECT CAST(l_suppkey AS VARCHAR), count(*)
        |    FROM lineitem GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 1)
        |      t(top_value, top_n)
        |  UNION ALL
        |  SELECT 'l_orderkey', d_ok, top_value, top_n FROM card, (
        |    SELECT CAST(l_orderkey AS VARCHAR), count(*)
        |    FROM lineitem GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 1)
        |      t(top_value, top_n))
        |SELECT col_name, n_distinct, top_value, top_n,
        |  round(top_n / (SELECT CAST(total AS DOUBLE) FROM card), 4)
        |    AS top_share
        |FROM tops ORDER BY col_name""".stripMargin,

    "dq_freshness" ->
      """WITH pt AS (
        |  SELECT event_type,
        |    max(epoch_us(CAST(ts AS TIMESTAMP))) AS max_us
        |  FROM events GROUP BY 1),
        |g AS (SELECT max(max_us) AS g_us FROM pt)
        |SELECT event_type, (g_us - max_us) // 1000000 AS lag_sec,
        |  CAST(g_us - max_us <= 86400000000 AS BIGINT) AS fresh
        |FROM pt, g ORDER BY event_type""".stripMargin,

    "dq_volume_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP)))
        |    AS BIGINT) AS day, count(*) AS n
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT day, n,
        |    count(n) OVER w AS t_n, sum(n) OVER w AS t_sum
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT day, n, CAST((t_sum * 2 + 7) // 14 AS BIGINT) AS trail_mean,
        |  CAST(n * 14 < t_sum AS BIGINT) AS anomaly
        |FROM t WHERE t_n = 7 ORDER BY day""".stripMargin,

    "dq_advanced" -> u(Seq(
      pairGreaterRow("lineitem", "l_extendedprice", "l_discount", 1.0),
      pairGreaterRow("lineitem", "l_tax", "l_discount", 0.5),
      compoundUniqueRow("lineitem", Seq("l_orderkey", "l_linenumber")),
      medianRow("lineitem", "l_quantity", 20, 30),
      quantileRow("lineitem", "l_quantity", 0.9, 40, 50),
      distinctInSetRow("orders", "o_orderstatus", Seq("F", "O", "P")),
      distinctInSetRow("orders", "o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM")))),

    "dq_advanced2" -> u(Seq(
      minRow("lineitem", "l_quantity", 1, 1),
      maxRow("lineitem", "l_quantity", 50, 50),
      sumRow("lineitem", "l_quantity", 1, 1e9),
      increasingRow("lineitem", "l_quantity", "l_orderkey", strictly = false),
      minRow("orders", "o_totalprice", 0, 1000),
      maxRow("orders", "o_totalprice", 0, 600000),
      increasingRow("orders", "o_orderkey", "o_orderkey", strictly = true))),

    "dq_quarantine" ->
      """SELECT route, count(*) AS n, round(sum(l_extendedprice),4) AS total
        |FROM (SELECT CASE WHEN (l_quantity IS NULL OR (l_quantity >= 1 AND l_quantity <= 45))
        |              AND (l_discount IS NULL OR (l_discount >= 0 AND l_discount <= 0.08))
        |             THEN 'valid' ELSE 'quarantine' END AS route, l_extendedprice
        |      FROM lineitem)
        |GROUP BY route ORDER BY route""".stripMargin,

    // Declared-vs-actual schema conformance: the oracle pins the
    // EXPECTED report as literals (the orders parquet footer is the
    // contract — 6 columns, all matching). A reader-side type change
    // flips actual_type/success in the Spark output and the hash
    // compare fails.
    "dq_schema" ->
      """SELECT * FROM (VALUES
        |  ('o_custkey', 'bigint', 'bigint', CAST(1 AS BIGINT)),
        |  ('o_orderdate', 'timestamp_ntz', 'timestamp_ntz', CAST(1 AS BIGINT)),
        |  ('o_orderkey', 'bigint', 'bigint', CAST(1 AS BIGINT)),
        |  ('o_orderpriority', 'string', 'string', CAST(1 AS BIGINT)),
        |  ('o_orderstatus', 'string', 'string', CAST(1 AS BIGINT)),
        |  ('o_totalprice', 'double', 'double', CAST(1 AS BIGINT)))
        |  t(col_name, expected_type, actual_type, success)
        |ORDER BY col_name""".stripMargin
  )
}
