package graft.text

import graft.{QueryModule, Tables => T, Util}
import graft.Util.r4
import org.apache.spark.sql.functions._

/** Gopher-style repetition signals: within-document token repetition
  * is the classic low-quality marker for pretraining corpora (high
  * top-token fraction / low distinct ratio ⇒ boilerplate or spam).
  * Pure explode → two partial aggs keyed by doc — linear in corpus
  * size, no pairwise work.
  */
object TextQueries3 extends QueryModule {

  val queries: Map[String, Q] = Map(
    "text_repetition" -> ((s, d) => {
      import s.implicits._
      val tc = T.documents(s, d)
        .select($"doc_id", explode(Util.tokens($"text")).as("tok"))
        .groupBy($"doc_id", $"tok")
        .agg(count(lit(1)).as("c"))
      tc.groupBy($"doc_id")
        .agg(sum($"c").as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          max($"c").as("top_count"))
        .select($"doc_id", $"n_tokens",
          r4($"n_distinct".cast("double") / $"n_tokens").as("distinct_ratio"),
          r4($"top_count".cast("double") / $"n_tokens").as("top_tok_frac"))
        .orderBy($"doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "text_repetition" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  round(count(*) / CAST(sum(c) AS DOUBLE), 4) AS distinct_ratio,
        |  round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_tok_frac
        |FROM tc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
