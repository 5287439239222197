package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal modeling operators: SCD2 validity intervals built from a
  * change stream, and gaps-and-islands streak detection. Both
  * partition by entity key — per-key window state, no global sort —
  * so they scale exactly like the sessionize/as-of family.
  */
object TemporalQueries extends QueryModule {

  /** 9999-12-31T23:59:59Z — the open-interval sentinel. */
  private val EndOfTime = 253402300799L

  val queries: Map[String, Q] = Map(
    "q_scd2" -> ((s, d) => {
      import s.implicits._
      // SCD2 build: each user's event_type is their "state"; runs of
      // the same state compress to one row with [valid_from, valid_to)
      // from the change points — the warehouse dimension-history
      // pattern, done as two per-key windows (change detect + lead).
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val changes = T.events(s, d)
        .select($"user_id", $"event_id", $"ts", $"event_type")
        .withColumn("prev", lag($"event_type", 1).over(w))
        .filter($"prev".isNull || $"prev" =!= $"event_type")
      changes
        .withColumn("vt", lead($"ts", 1).over(w))
        .select($"user_id", $"event_type".as("state"),
          unix_timestamp($"ts").as("valid_from"),
          coalesce(unix_timestamp($"vt"), lit(EndOfTime)).as("valid_to"))
        .orderBy($"user_id", $"valid_from", $"valid_to", $"state")
    }),

    // Interval union: merge each user's events into maximal activity
    // intervals (gap > 30 min starts a new one) and report covered
    // time — the coverage variant of sessionization (the output is
    // the merged interval set's geometry, not session counts). Exact
    // integer microseconds throughout.
    "q_interval_merge" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      T.events(s, d)
        .withColumn("us", unix_micros($"ts"))
        .withColumn("prev", lag($"us", 1).over(w))
        .withColumn("brk",
          when($"prev".isNull || $"us" - $"prev" > 30L * 60 * 1000000, 1L)
            .otherwise(0L))
        .withColumn("sess", sum($"brk").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"sess")
        .agg(min($"us").as("lo"), max($"us").as("hi"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum($"hi" - $"lo").as("cov_us"), max($"hi" - $"lo").as("max_us"))
        // integer division on BOTH engine sides — a double divide +
        // cast would truncate in Spark but round in DuckDB
        .select($"user_id", $"n_intervals",
          expr("cov_us div 1000000").as("covered_sec"),
          expr("max_us div 1000000").as("longest_sec"))
        .orderBy($"user_id")
    }),

    "q_streaks" -> ((s, d) => {
      import s.implicits._
      // Gaps-and-islands: longest run of consecutive active days per
      // user. day − row_number is constant within an island, so one
      // distinct + two partial aggs find every streak without
      // self-joins.
      val days = T.events(s, d)
        .select($"user_id", to_date($"ts").as("day")).distinct()
      val w = Window.partitionBy($"user_id").orderBy($"day")
      days
        .withColumn("grp", date_sub($"day", row_number().over(w)))
        .groupBy($"user_id", $"grp")
        .agg(count(lit(1)).as("len"))
        .groupBy($"user_id")
        .agg(max($"len").as("max_streak"), count(lit(1)).as("n_streaks"))
        .orderBy($"user_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_interval_merge" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (
        |  SELECT user_id, us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM b),
        |iv AS (
        |  SELECT user_id, sess, min(us) AS lo, max(us) AS hi
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(hi - lo) // 1000000 AS BIGINT) AS covered_sec,
        |  max(hi - lo) // 1000000 AS longest_sec
        |FROM iv GROUP BY 1 ORDER BY user_id""".stripMargin,

    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    event_type FROM events),
        |c AS (SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev FROM e),
        |ch AS (SELECT user_id, event_id, ts, event_type FROM c
        |  WHERE prev IS NULL OR prev <> event_type),
        |iv AS (SELECT user_id, event_type AS state, ts AS vf,
        |    lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS vt FROM ch)
        |SELECT user_id, state,
        |  CAST(floor(epoch(vf)) AS BIGINT) AS valid_from,
        |  CAST(COALESCE(floor(epoch(vt)), 253402300799) AS BIGINT) AS valid_to
        |FROM iv ORDER BY user_id, valid_from, valid_to, state""".stripMargin,

    "q_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |isl AS (SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY day) AS INTEGER) AS grp FROM days),
        |st AS (SELECT user_id, grp, count(*) AS len
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, max(len) AS max_streak, count(*) AS n_streaks
        |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
