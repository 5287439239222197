package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lifecycle analytics: churn and new-vs-returning decomposition.
  *
  * Both derive from the distinct (user, period) activity set — a
  * partial-agg-friendly reduction of the event stream — and then one
  * per-user window (lead / running min). No set-difference self-joins:
  * the anti-join formulation shuffles the activity set twice, the
  * window form once.
  */
object BehaviorQueries2 extends QueryModule {

  val queries: Map[String, Q] = Map(
    // New-user activation: per first-seen weekly cohort, the share of
    // users reaching ≥3 events within 7 days of their first event —
    // the onboarding-health metric. One per-user min (partial agg) +
    // one bounded self-enrichment; integer counts, exact everywhere.
    "q_activation" -> ((s, d) => {
      import s.implicits._
      val firstSeen = T.events(s, d)
        .groupBy($"user_id").agg(min($"ts").as("first_ts"))
      val early = T.events(s, d).join(firstSeen, "user_id")
        .filter($"ts" < $"first_ts" + expr("INTERVAL 7 DAYS"))
        .groupBy($"user_id", $"first_ts")
        .agg(count(lit(1)).as("n_early"))
      early
        .groupBy(date_trunc("week", $"first_ts").cast("date")
          .cast("string").as("cohort"))
        .agg(count(lit(1)).as("n_new"),
          count_if($"n_early" >= 3).as("n_activated"),
          r4(count_if($"n_early" >= 3).cast("double") / count(lit(1)))
            .as("activation_rate"))
        .orderBy($"cohort")
    }),

    // Week-over-week churn: a user active in epoch-week m churns at m
    // if their next active week is not m+1. Final week is excluded
    // (right-censored — no m+1 observable).
    "q_churn" -> ((s, d) => {
      import s.implicits._
      val ua = T.events(s, d)
        .select($"user_id",
          floor(unix_date($"ts".cast("date")) / 7).cast("long").as("m"))
        .distinct()
      val w = Window.partitionBy($"user_id").orderBy($"m")
      val maxM = ua.agg(max($"m").as("max_m"))
      ua.withColumn("next_m", lead($"m", 1).over(w))
        .crossJoin(broadcast(maxM))
        .filter($"m" < $"max_m")
        .groupBy($"m")
        .agg(count(lit(1)).as("active"),
          count_if($"next_m".isNull || $"next_m" =!= $"m" + 1)
            .as("churned"))
        .select($"m", $"active", $"churned",
          r4($"churned".cast("double") / $"active").as("churn_rate"))
        .orderBy($"m")
    }),

    // New vs returning actives per day: first-seen day via a running
    // min over the per-user day sequence.
    "q_new_vs_returning" -> ((s, d) => {
      import s.implicits._
      val ua = T.events(s, d)
        .select($"user_id", $"ts".cast("date").as("day")).distinct()
      val w = Window.partitionBy($"user_id").orderBy($"day")
      ua.withColumn("first_day", min($"day").over(w))
        .groupBy($"day")
        .agg(count_if($"day" === $"first_day").as("new_users"),
          count_if($"day" =!= $"first_day").as("returning"))
        .orderBy($"day")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_activation" ->
      """WITH fs AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_ts
        |  FROM events GROUP BY 1),
        |early AS (
        |  SELECT e.user_id, fs.first_ts, count(*) AS n_early
        |  FROM events e JOIN fs ON e.user_id = fs.user_id
        |  WHERE CAST(e.ts AS TIMESTAMP) < fs.first_ts + INTERVAL 7 DAY
        |  GROUP BY 1, 2)
        |SELECT CAST(CAST(date_trunc('week', first_ts) AS DATE) AS VARCHAR)
        |    AS cohort,
        |  count(*) AS n_new,
        |  CAST(count(*) FILTER (n_early >= 3) AS BIGINT) AS n_activated,
        |  round(count(*) FILTER (n_early >= 3) / CAST(count(*) AS DOUBLE), 4)
        |    AS activation_rate
        |FROM early GROUP BY 1 ORDER BY cohort""".stripMargin,

    "q_churn" ->
      """WITH ua AS (SELECT DISTINCT user_id,
        |    CAST(floor(CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE)
        |      - DATE '1970-01-01' AS INT) / 7.0) AS BIGINT) AS m
        |  FROM events),
        |maxm AS (SELECT max(m) AS max_m FROM ua),
        |led AS (SELECT user_id, m,
        |    lead(m) OVER (PARTITION BY user_id ORDER BY m) AS next_m
        |  FROM ua)
        |SELECT m, count(*) AS active,
        |  CAST(count(*) FILTER (next_m IS NULL OR next_m <> m + 1)
        |    AS BIGINT) AS churned,
        |  round(count(*) FILTER (next_m IS NULL OR next_m <> m + 1)
        |    / CAST(count(*) AS DOUBLE), 4) AS churn_rate
        |FROM led CROSS JOIN maxm
        |WHERE m < max_m
        |GROUP BY m ORDER BY m""".stripMargin,

    "q_new_vs_returning" ->
      """WITH ua AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |fs AS (SELECT user_id, day,
        |    min(day) OVER (PARTITION BY user_id ORDER BY day) AS first_day
        |  FROM ua)
        |SELECT day,
        |  CAST(count(*) FILTER (day = first_day) AS BIGINT) AS new_users,
        |  CAST(count(*) FILTER (day <> first_day) AS BIGINT) AS returning
        |FROM fs GROUP BY day ORDER BY day""".stripMargin
  )
}
