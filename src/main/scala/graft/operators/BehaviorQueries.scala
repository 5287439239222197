package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.2b behavioral analytics over the `events` stream table:
  * cohort retention, event co-occurrence, last-touch attribution.
  *
  * All windows partition by `user_id` — state per key, never a global
  * sort — the same layout Structured Streaming's stateful operators
  * would use on the live stream.
  */
object BehaviorQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    "q_retention" -> ((s, d) => {
      import s.implicits._
      // Weekly cohort retention: users grouped by first-seen week,
      // counted in each later activity week. Two partial-agg
      // shuffles on user_id + one count distinct — no pairwise blowup.
      val ev = T.events(s, d)
        .select($"user_id", date_trunc("week", $"ts").cast("date").as("wk"))
      val cohort = ev.groupBy($"user_id").agg(min($"wk").as("cwk"))
      ev.distinct()
        .join(cohort, "user_id")
        .groupBy(date_format($"cwk", "yyyy-MM-dd").as("cohort_wk"),
          (datediff($"wk", $"cwk") / 7).cast("long").as("week_offset"))
        .agg(countDistinct($"user_id").as("users"))
        .orderBy($"cohort_wk", $"week_offset")
    }),

    "q_cooccur" -> ((s, d) => {
      import s.implicits._
      // Which event types co-occur for the same user: distinct
      // (user, type) self-joined on user with a < b to emit each
      // unordered pair once.
      val ut = T.events(s, d).select($"user_id", $"event_type").distinct()
      ut.toDF("user_id", "type_a")
        .join(ut.toDF("user_id", "type_b"), "user_id")
        .filter($"type_a" < $"type_b")
        .groupBy($"type_a", $"type_b")
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"type_a", $"type_b")
    }),

    "q_attribution" -> ((s, d) => {
      import s.implicits._
      // Last-touch attribution: a purchase is attributed when the
      // same user clicked within the preceding hour. Running
      // conditional max over a per-user window carries the last click
      // time — one shuffle on user_id, state O(1) per user.
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events(s, d)
        .withColumn("last_click",
          max(when($"event_type" === "click", $"ts")).over(w))
        .filter($"event_type" === "purchase")
        .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("purchases"),
          sum(when($"last_click".isNotNull &&
            $"ts" <= $"last_click" + expr("interval 1 hour"), 1L)
            .otherwise(0L)).as("attributed"))
        .orderBy($"day")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_retention" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP))::DATE AS wk
        |  FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cwk FROM ev GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, wk FROM ev)
        |SELECT strftime(cwk, '%Y-%m-%d') AS cohort_wk,
        |  CAST(date_diff('day', cwk, wk) / 7 AS BIGINT) AS week_offset,
        |  count(DISTINCT a.user_id) AS users
        |FROM act a JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_wk, week_offset""".stripMargin,

    "q_cooccur" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  count(*) AS n_users
        |FROM ut a JOIN ut b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin,

    "q_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events),
        |p AS (SELECT ts, event_type,
        |    max(CASE WHEN event_type = 'click' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
        |  FROM e)
        |SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS purchases,
        |  CAST(sum(CASE WHEN last_click IS NOT NULL
        |    AND ts <= last_click + INTERVAL 1 HOUR THEN 1 ELSE 0 END) AS BIGINT)
        |    AS attributed
        |FROM p WHERE event_type = 'purchase'
        |GROUP BY day ORDER BY day""".stripMargin
  )
}
