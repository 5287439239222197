package graft.text

import graft.{QueryModule, Tables => T, Util}
import graft.Util.r4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.7b corpus statistics: stopword filtering and TF-IDF term
  * ranking — both pure groupBy/join pipelines (map-side partials,
  * broadcastable document-frequency side), no driver-side vocab.
  */
object TextQueries2 extends QueryModule {

  /** Tiny demo stoplist — shared verbatim with the SQL oracle. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by")

  val queries: Map[String, Q] = Map(
    "text_stopwords" -> ((s, d) => {
      import s.implicits._
      T.documents(s, d)
        .filter($"doc_id" < 500)
        .select(explode(Util.tokens($"text")).as("t"))
        .select(regexp_replace(lower($"t"), "[^a-z]", "").as("tok"))
        .filter(length($"tok") > 2 && !$"tok".isin(stopwords: _*))
        .groupBy($"tok")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"tok")
        .limit(25)
    }),

    "text_tfidf" -> ((s, d) => {
      import s.implicits._
      // tf from one grouped pass; document frequency re-aggregated
      // from tf (already distinct per doc-term) and broadcast back —
      // the corpus is never joined pairwise. N is a 1-row broadcast.
      val docs = T.documents(s, d).filter($"doc_id" < 100)
      val terms = docs
        .select($"doc_id", explode(Util.tokens($"text")).as("t"))
        .filter(length($"t") > 0)
        .select($"doc_id", lower($"t").as("term"))
      val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val n = docs.agg(countDistinct($"doc_id").as("n"))
      val scored = tf.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(n))
        .withColumn("score", $"tf" * log($"n" / $"df"))
      val w = Window.partitionBy($"doc_id")
        .orderBy($"score".desc, $"term".asc)
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 3)
        .select($"doc_id", $"term", r4($"score").as("score"), $"rank")
        .orderBy($"doc_id", $"rank")
    })
  )

  val oracles: Map[String, String] = Map(
    "text_stopwords" -> (
      """SELECT tok, count(*) AS n FROM (
        |  SELECT regexp_replace(lower(t), '[^a-z]', '', 'g') AS tok FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS t
        |    FROM documents WHERE doc_id < 500))
        |WHERE length(tok) > 2 AND tok NOT IN (""".stripMargin +
        stopwords.map("'" + _ + "'").mkString(", ") +
        """)
          |GROUP BY tok ORDER BY n DESC, tok LIMIT 25""".stripMargin),

    "text_tfidf" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
        |terms AS (
        |  SELECT doc_id, lower(t) AS term FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |    FROM d)
        |  WHERE length(t) > 0),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM d)
        |SELECT doc_id, term, round(tf * ln(n / df),4) AS score,
        |  CAST(rnk AS BIGINT) AS rank
        |FROM (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df, n.n,
        |        row_number() OVER (PARTITION BY tf.doc_id
        |          ORDER BY tf.tf * ln(n.n / dfreq.df) DESC, tf.term ASC) AS rnk
        |      FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |WHERE rnk <= 3 ORDER BY doc_id, rank""".stripMargin
  )
}
