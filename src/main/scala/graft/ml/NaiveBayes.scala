package graft.ml

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial naive Bayes as pure relational algebra: train = two
  * grouped counts (class priors, per-class token counts with Laplace
  * smoothing), predict = posting-list join + one log-sum aggregate +
  * argmax window.
  *
  * Nothing iterates and nothing collects: the model IS a DataFrame
  * (class × token log-likelihoods) that joins against the test token
  * stream — at 100 TB the model is dimension-sized (vocab × classes)
  * and broadcasts, so scoring is one shuffle keyed on the test doc.
  *
  * Even doc_ids train, odd evaluate; the label is the corpus `lang`
  * column. Out-of-vocabulary test tokens are dropped (the standard
  * "ignore unseen words" multinomial NB variant, which keeps the
  * oracle's arithmetic identical).
  */
object NaiveBayes extends QueryModule {

  val queries: Map[String, Q] = Map(
    "ml_nb_lang" -> ((s, d) => {
      import s.implicits._
      val toks = T.documents(s, d)
        .select($"doc_id", $"lang",
          explode(graft.Util.tokens($"text")).as("tok"))
      val train = toks.filter($"doc_id" % 2 === 0)
      val test = toks.filter($"doc_id" % 2 === 1)

      // priors: log P(class) over training DOCS
      val docsPerClass = train.select($"doc_id", $"lang").distinct()
        .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      val nDocs = docsPerClass.agg(sum($"n_docs").as("n_total"))
      val priors = docsPerClass.crossJoin(broadcast(nDocs))
        .select($"lang", log($"n_docs" / $"n_total").as("log_prior"))

      // likelihoods: log P(tok|class) with add-1 smoothing over the
      // training vocabulary
      val tokClass = train.groupBy($"lang", $"tok")
        .agg(count(lit(1)).as("c"))
      val classTot = tokClass.groupBy($"lang").agg(sum($"c").as("ct"))
      val vocab = train.agg(countDistinct($"tok").as("v"))
      val loglik = tokClass.join(classTot, "lang")
        .crossJoin(broadcast(vocab))
        .select($"lang".as("model_lang"), $"tok",
          log(($"c" + 1) / ($"ct" + $"v")).as("ll"))

      // score every test doc against every class that knows the token
      val scored = test.join(broadcast(loglik), "tok")
        .groupBy($"doc_id", $"lang", $"model_lang")
        .agg(sum($"ll").as("sum_ll"), count(lit(1)).as("n_tok"))
        .join(broadcast(priors.withColumnRenamed("lang", "model_lang")),
          "model_lang")
        .select($"doc_id", $"lang", $"model_lang",
          r4($"sum_ll" + $"log_prior").as("score"))
      val w = Window.partitionBy($"doc_id")
        .orderBy($"score".desc, $"model_lang")
      scored.withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .groupBy($"lang", $"model_lang".as("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"lang", $"pred")
    })
  )

  val oracles: Map[String, String] = Map(
    "ml_nb_lang" ->
      """WITH toks AS (SELECT doc_id, lang,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |train AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
        |test AS (SELECT * FROM toks WHERE doc_id % 2 = 1),
        |dpc AS (SELECT lang, count(*) AS n_docs
        |  FROM (SELECT DISTINCT doc_id, lang FROM train) GROUP BY 1),
        |nd AS (SELECT sum(n_docs) AS n_total FROM dpc),
        |priors AS (SELECT lang, ln(n_docs / CAST(n_total AS DOUBLE))
        |    AS log_prior FROM dpc CROSS JOIN nd),
        |tc AS (SELECT lang, tok, count(*) AS c FROM train GROUP BY 1, 2),
        |ct AS (SELECT lang, sum(c) AS ct FROM tc GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS v FROM train),
        |loglik AS (SELECT tc.lang AS model_lang, tok,
        |    ln((c + 1) / CAST(ct.ct + v.v AS DOUBLE)) AS ll
        |  FROM tc JOIN ct ON tc.lang = ct.lang CROSS JOIN v),
        |scored AS (SELECT t.doc_id, t.lang, l.model_lang,
        |    round(sum(l.ll) + any_value(p.log_prior), 4) AS score
        |  FROM test t
        |  JOIN loglik l ON t.tok = l.tok
        |  JOIN priors p ON p.lang = l.model_lang
        |  GROUP BY 1, 2, 3),
        |best AS (SELECT doc_id, lang, model_lang AS pred FROM (
        |  SELECT doc_id, lang, model_lang, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, model_lang) AS rk
        |  FROM scored) WHERE rk = 1)
        |SELECT lang, pred, count(*) AS n
        |FROM best GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin
  )
}
