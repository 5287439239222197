package graft.text

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.functions._

/** §2.7 — text analysis over `documents`. */
object TextQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    "text_tokens" -> ((s, d) => {
      import s.implicits._
      T.documents(s, d).select(
        $"doc_id",
        size(TextAnalysis.tokens($"text")).cast("long").as("n_ws_tokens"),
        TextAnalysis.bpeishCount($"text").as("n_bpeish"))
        .orderBy($"doc_id")
    }),

    "text_quality" -> ((s, d) => {
      import s.implicits._
      TextAnalysis.qualityFeatures(T.documents(s, d), "text")
        .select($"doc_id", $"n_words", $"punct_n", $"stop_n",
          $"stop_ratio", $"avg_word_len")
        .orderBy($"doc_id")
    }),

    "text_langid" -> ((s, d) => {
      import s.implicits._
      T.documents(s, d).select(
        $"doc_id", $"lang",
        TextAnalysis.langPredict($"text").as("lang_pred"))
        .withColumn("correct", ($"lang" === $"lang_pred").cast("long"))
        .orderBy($"doc_id")
    }),

    // Multiclass confusion matrix for the language classifier against
    // the corpus ground-truth labels — the eval loop every heuristic
    // gate needs before it filters a corpus by language.
    "text_langid_eval" -> ((s, d) => {
      import s.implicits._
      T.documents(s, d).select($"lang",
          TextAnalysis.langPredict($"text").as("lang_pred"))
        .groupBy($"lang", $"lang_pred")
        .agg(count(lit(1)).as("n"))
        .orderBy($"lang", $"lang_pred")
    }),

    "text_fingerprint" -> ((s, d) => {
      import s.implicits._
      T.documents(s, d).select(
        $"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
        .orderBy($"doc_id")
    }),

    "text_ngrams" -> ((s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select(explode(TextAnalysis.tokens($"text")).as("token"))
        .groupBy($"token")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token".asc)
        .limit(20)
    })
  )

  // language patterns, mirrored verbatim from TextAnalysis.langPatterns
  private val en = "\\b(?:the|and|of|to|is|it)\\b"
  private val de = "\\b(?:der|die|das|und|ist|nicht|mit|ein)\\b"
  private val es = "\\b(?:el|los|las|y|que|un|una|por)\\b"
  private val fr = "\\b(?:le|les|et|est|une|dans|pour|sur)\\b"

  val oracles: Map[String, String] = Map(
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words,
         |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_n,
         |  CAST(len(regexp_extract_all(lower(text), '\\b(?:the|a|an|and|or|of|to|in|is|it)\\b')) AS BIGINT) AS stop_n,
         |  round(CAST(len(regexp_extract_all(lower(text), '\\b(?:the|a|an|and|or|of|to|in|is|it)\\b')) AS DOUBLE)
         |        / len(string_split_regex(trim(text), '\\s+')), 4) AS stop_ratio,
         |  round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |        / len(string_split_regex(trim(text), '\\s+')), 4) AS avg_word_len
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      s"""SELECT doc_id, lang, lang_pred,
         |  CAST(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END AS BIGINT) AS correct
         |FROM (
         |  SELECT doc_id, lang,
         |    CASE WHEN len(regexp_extract_all(text, '[一-鿿]')) >= 3 THEN 'zh'
         |         WHEN de_n > en_n AND de_n >= es_n AND de_n >= fr_n THEN 'de'
         |         WHEN es_n > en_n AND es_n >= fr_n THEN 'es'
         |         WHEN fr_n > en_n THEN 'fr'
         |         ELSE 'en' END AS lang_pred
         |  FROM (
         |    SELECT doc_id, lang, text,
         |      len(regexp_extract_all(lower(text), '$en')) AS en_n,
         |      len(regexp_extract_all(lower(text), '$de')) AS de_n,
         |      len(regexp_extract_all(lower(text), '$es')) AS es_n,
         |      len(regexp_extract_all(lower(text), '$fr')) AS fr_n
         |    FROM documents))
         |ORDER BY doc_id""".stripMargin,

    "text_langid_eval" ->
      s"""SELECT lang, lang_pred, count(*) AS n FROM (
         |  SELECT lang,
         |    CASE WHEN len(regexp_extract_all(text, '[一-鿿]')) >= 3 THEN 'zh'
         |         WHEN de_n > en_n AND de_n >= es_n AND de_n >= fr_n THEN 'de'
         |         WHEN es_n > en_n AND es_n >= fr_n THEN 'es'
         |         WHEN fr_n > en_n THEN 'fr'
         |         ELSE 'en' END AS lang_pred
         |  FROM (
         |    SELECT lang, text,
         |      len(regexp_extract_all(lower(text), '$en')) AS en_n,
         |      len(regexp_extract_all(lower(text), '$de')) AS de_n,
         |      len(regexp_extract_all(lower(text), '$es')) AS es_n,
         |      len(regexp_extract_all(lower(text), '$fr')) AS fr_n
         |    FROM documents))
         |GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_ngrams" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin
  )
}
