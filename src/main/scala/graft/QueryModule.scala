package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named bundle of driver-checkable queries.
  *
  * `queries` produce DataFrames from a scale-factor directory;
  * `oracles` hold the DuckDB-equivalent ANSI SQL with IDENTICAL
  * column aliases and a total ORDER BY, so the driver's
  * sort-columns-then-hash compare is deterministic.
  *
  * Contract note: a query builder is *usually* pure plan
  * construction, but sketch-driven queries (q_heavy_hitters,
  * q_bloom_prune, and the iterative fits in ml_logreg/ml_kmeans/
  * q_pagerank) legitimately RUN bounded jobs at construction time —
  * a sketch or model must materialize before the result plan can
  * reference it. Callers that only want the plan shape (explain,
  * schema probes, plan-assertion tests) should use queries known to
  * be construction-pure; Verify/Bench always execute, so they are
  * indifferent.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}

/** Cross-module column helpers (all codegen'd built-ins, no UDFs). */
object Util {
  /** 4-dp rounding applied to every floating aggregate on BOTH sides
    * of the oracle compare, absorbing fp summation-order noise. */
  def r4(c: Column): Column = round(c, 4)

  /** Like [[r4]] but additionally normalizes IEEE negative zero
    * (-0.0 + 0.0 = +0.0). DuckDB's round() preserves the sign of
    * -1.8e-16 → -0.0 while Spark's BigDecimal round returns +0.0, so
    * trig features that land exactly on an axis hash-mismatch unless
    * BOTH sides add zero after rounding. */
  def r4z(c: Column): Column = round(c, 4) + lit(0.0)

  /** Cosine similarity over two float/double array columns via the
    * codegen'd [[graft.functions.ArrayDot]] expression. Sums
    * accumulate sequentially in DOUBLE — same order as DuckDB's
    * list_cosine_similarity on DOUBLE[], so results agree bitwise
    * up to rounding. */
  def cosine(a: Column, b: Column): Column = {
    val dot = graft.functions.ArrayDot.dot _
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** Whitespace tokenization matching DuckDB
    * `string_split_regex(trim(x), '\s+')`. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Ensure minimum map-side parallelism for CPU-heavy per-row ops.
    * A small parquet scan arrives under-split — files below
    * `spark.sql.files.openCostInBytes` never split, so a local
    * single-row-group file is ONE partition and every downstream map
    * runs single-threaded; on a real cluster inputs dwarf the open
    * cost, come pre-split, and this is a no-op. The decision reads
    * the OPTIMIZED-plan size estimate (file-size sum for scans) — no
    * physical planning, unlike `df.rdd.getNumPartitions`, which
    * builds and discards a full physical plan just to count. The
    * scan under-parallelizes exactly when total bytes can't fill
    * `defaultParallelism` open-cost-sized splits, which is the
    * repartition condition. The shuffled bytes are the raw rows —
    * only use ahead of work that dwarfs one pass over the data. */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val openCost = spark.sessionState.conf.filesOpenCostInBytes
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(target) * openCost) df.repartition(target) else df
  }

  /** Salted equi-join for key skew that AQE cannot reach: the skewed
    * side gets a deterministic salt from a row-identifying column,
    * the other side is replicated `salts` ways, and the join key
    * becomes (key, salt) — one hot key spreads over `salts` reducers.
    *
    * Reach for AQE FIRST: the round-12 skew probe (BASELINE.md, one
    * key owning 30% of a 6M-row fact) measured AQE's skew-join split
    * at 0.98 s vs 1.57 s naive, while salting lost outright (1.97 s
    * at 8 salts, 5.73 s at 32) because replication of a non-tiny
    * right side dominates. The round-13 probe closed the claimed
    * AGGREGATION niche too: on the same 30%-hot group key, naive
    * groupBy beat the salted two-phase shape for both an algebraic
    * agg (sum: 0.50 s vs 1.07 s — map-side partial aggregation
    * already collapses the hot key to one row per map task) and a
    * distinct agg (countDistinct: 1.12 s vs 1.62 s — the
    * distinct-expand rewrite already shuffles on (key, value), which
    * is balanced). What remains for this helper: joins whose skew
    * exceeds AQE's split thresholds AND whose right side is small
    * enough that `salts`× replication is genuinely cheap, and
    * engines/pipelines where AQE is off. Measure before reaching. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      saltFrom: String, salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val l = skewed.withColumn("__salt",
      pmod(xxhash64(col(saltFrom)), lit(salts)).cast("int"))
    val r = other.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Pure interval join (NO equi key) rewritten as an equi join on
    * range bins — the classic range-join optimization. Spark plans a
    * bare `p BETWEEN lo AND hi` join as a broadcast nested loop:
    * every point compared against every interval, O(|P|·|I|), a
    * scale killer the moment neither side is tiny. Binning restores
    * hash partitioning: a point matches an interval only if they
    * share a `binWidth`-sized bin, so each interval explodes into
    * the bins it covers (O(length/binWidth + 1) rows), the join key
    * becomes the BIN (equi, shuffled, AQE-planned), and the exact
    * BETWEEN predicate filters within co-binned pairs. Pick
    * `binWidth` near the typical interval length: intervals then
    * explode into ~2 bins and each point meets only the intervals
    * overlapping its neighborhood. The two inputs must not share any
    * column name; `pointCol`/`loCol`/`hiCol` must be integral (cast
    * dates via datediff first). */
  def binnedIntervalJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val p = points.withColumn("__bin",
      floor(col(pointCol).cast("long") / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol).cast("long") / binWidth).cast("long"),
        floor(col(hiCol).cast("long") / binWidth).cast("long"))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
