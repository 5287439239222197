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
    "text_bm25" -> ((s, d) => {
      import s.implicits._
      // BM25 (k1=1.2, b=0.75) for a fixed query against the corpus.
      // Everything decomposes: tf/df/dl are partial aggs, corpus
      // stats are a 1-row broadcast — no operator holds a posting
      // list, so the ranking runs at corpus scale. The IN-list on
      // query terms prunes the token stream before any shuffle.
      val q = Seq("spark", "data", "query")
      val toks = T.documents(s, d)
        .select($"doc_id", explode(Util.tokens($"text")).as("tok"))
      val dl = toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), avg($"dl").as("avgdl"))
      val tf = toks.filter($"tok".isin(q: _*))
        .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
      val score = log(($"n_docs" - $"df" + 0.5) / ($"df" + 0.5) + 1) *
        ($"tf" * 2.2) /
        ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / $"avgdl"))
      tf.join(dl, "doc_id")
        .join(broadcast(df), "tok")
        .crossJoin(broadcast(stats))
        .groupBy($"doc_id")
        .agg(r4(sum(score)).as("bm25"))
        .orderBy($"bm25".desc, $"doc_id")
        .limit(50)
    }),

    // Data-mixing weights: per-source sampling weights ∝ tokens^α
    // with α = 0.5 (temperature-style up-weighting of small sources —
    // the standard pretraining-mixture knob). sqrt is used instead of
    // a general pow so both engines produce the correctly-rounded
    // IEEE result. Per-source token counts are ONE partial agg over
    // the token stream; the normalizer is a 1-row broadcast — at
    // 100 TB the mixture table costs a single corpus scan.
    "text_mix_weights" -> ((s, d) => {
      import s.implicits._
      val per = T.documents(s, d)
        .select($"source", size(Util.tokens($"text")).cast("long").as("toks"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"toks").as("n_tokens"))
        .withColumn("w_raw", sqrt($"n_tokens".cast("double")))
      val tot = per.agg(sum($"w_raw").as("w_tot"),
        sum($"n_tokens").as("tok_tot"))
      per.crossJoin(broadcast(tot))
        .select($"source", $"n_docs", $"n_tokens",
          r4($"n_tokens" / $"tok_tot").as("natural_share"),
          r4($"w_raw" / $"w_tot").as("mix_weight"))
        .orderBy($"source")
    }),

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
    }),

    // Unigram-LM surprisal (cross-entropy) per document: mean
    // −ln p(token) under the corpus unigram distribution — the
    // classic cheap outlier/quality signal (rare-token documents
    // score high). Corpus counts, the normalizer, and per-doc term
    // frequencies are three partial aggs over ONE token stream (AQE
    // reuses the exploded scan stage, same shape as text_bm25); the
    // tf⋈vocab join is df-bounded and the 1-row total broadcasts.
    "text_surprisal" -> ((s, d) => {
      import s.implicits._
      val toks = T.documents(s, d)
        .select($"doc_id", explode(Util.tokens($"text")).as("t"))
        .filter($"t" =!= "")
        .select($"doc_id", lower($"t").as("tok"))
      val corpus = toks.groupBy($"tok").agg(count(lit(1)).as("cf"))
      val tot = toks.agg(count(lit(1)).as("n"))
      val tf = toks.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
      tf.join(corpus, "tok").crossJoin(broadcast(tot))
        .groupBy($"doc_id")
        .agg(sum($"tf").as("n_tokens"),
          r4(-sum($"tf" * log($"cf".cast("double") / $"n")) / sum($"tf"))
            .as("surprisal"))
        .orderBy($"surprisal".desc, $"doc_id")
        .limit(50)
    }),

    // Perplexity-bucket data selection (the "train on the middle of
    // the LM-score distribution" curation rule, CCNet/DSIR-style):
    // per-doc unigram surprisal quintiles with per-bucket size and
    // token mass. The bucket key is the MICRO-QUANTIZED surprisal
    // (round×1e6 as BIGINT) so engines rank identical integers — the
    // ml_lift lesson applied to a float score — and the quintile
    // assignment rides the distributed Rank primitive (no
    // single-partition sort; spec'd discipline).
    "text_ppl_buckets" -> ((s, d) => {
      import s.implicits._
      val toks = T.documents(s, d)
        .select($"doc_id", explode(Util.tokens($"text")).as("t"))
        .filter($"t" =!= "")
        .select($"doc_id", lower($"t").as("tok"))
      val corpus = toks.groupBy($"tok").agg(count(lit(1)).as("cf"))
      val tot = toks.agg(count(lit(1)).as("n"))
      val perDoc = toks.groupBy($"doc_id", $"tok")
        .agg(count(lit(1)).as("tf"))
        .join(corpus, "tok").crossJoin(broadcast(tot))
        .groupBy($"doc_id")
        .agg(sum($"tf").as("n_tokens"),
          round(-sum($"tf" * log($"cf".cast("double") / $"n")) /
            sum($"tf") * 1e6).cast("long").as("qsurp"))
      val ranked = graft.operators.Rank.runningSums(
        perDoc, Nil, "qsurp", Seq("doc_id"), Seq("rn" -> lit(1L)))
      ranked
        .withColumn("bucket",
          graft.operators.Rank.ntileOf($"rn", $"rn_total", 5))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("tokens"),
          Util.r4(min($"qsurp") / 1e6).as("min_surprisal"),
          Util.r4(max($"qsurp") / 1e6).as("max_surprisal"))
        .orderBy($"bucket")
    }),

    // Zipf-slope corpus health check: OLS fit of ln(freq) ~ ln(rank)
    // over the top-1000 terms (natural text sits near −1; a flat or
    // cliff-shaped slope flags synthetic/boilerplate corpora). Term
    // counts are one partial agg over the token stream; top-k is a
    // TakeOrdered (no global sort); ranks on the ≤1000-row frame come
    // from the rank primitive at buckets=1 (schema-bounded input —
    // the q_spearman quantity-side case), and the fit is
    // covar_pop/var_pop — regr_slope's exact definition.
    "text_zipf" -> ((s, d) => {
      import s.implicits._
      val top = T.documents(s, d)
        .select(explode(Util.tokens($"text")).as("t"))
        .filter($"t" =!= "")
        .select(lower($"t").as("term"))
        .groupBy($"term").agg(count(lit(1)).as("f"))
        .orderBy($"f".desc, $"term").limit(1000)
      val rk = graft.operators.Rank
        .runningSums(top.withColumn("nf", -$"f"), Nil, "nf",
          Seq("term"), Seq("r" -> lit(1L)), 1)
        .select(log($"f".cast("double")).as("lnf"),
          log($"r".cast("double")).as("lnr"))
      rk.agg(covar_pop($"lnr", $"lnf").as("cv"), var_pop($"lnr").as("vr"),
          avg($"lnf").as("mf"), avg($"lnr").as("mr"),
          count(lit(1)).as("n_terms"))
        .select(r4($"cv" / $"vr").as("zipf_slope"),
          r4($"mf" - ($"cv" / $"vr") * $"mr").as("intercept"),
          $"n_terms")
    })
  )

  val oracles: Map[String, String] = Map(
    "text_surprisal" ->
      """WITH toks AS (SELECT doc_id, lower(t) AS tok
        |  FROM documents,
        |    unnest(string_split_regex(trim(text), '\s+')) AS u(t)
        |  WHERE t <> ''),
        |corpus AS (SELECT tok, count(*) AS cf FROM toks GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM toks),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2)
        |SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
        |  round(-sum(tf.tf * ln(CAST(cf AS DOUBLE) / n)) / sum(tf.tf), 4)
        |    AS surprisal
        |FROM tf JOIN corpus USING (tok) CROSS JOIN tot
        |GROUP BY 1 ORDER BY surprisal DESC, doc_id LIMIT 50""".stripMargin,

    "text_ppl_buckets" ->
      """WITH toks AS (SELECT doc_id, lower(t) AS tok
        |  FROM documents,
        |    unnest(string_split_regex(trim(text), '\s+')) AS u(t)
        |  WHERE t <> ''),
        |corpus AS (SELECT tok, count(*) AS cf FROM toks GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM toks),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |perdoc AS (
        |  SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
        |    CAST(round(-sum(tf.tf * ln(CAST(cf AS DOUBLE) / n))
        |      / sum(tf.tf) * 1e6) AS BIGINT) AS qsurp
        |  FROM tf JOIN corpus USING (tok) CROSS JOIN tot
        |  GROUP BY 1),
        |b AS (
        |  SELECT *, ntile(5) OVER (ORDER BY qsurp, doc_id) AS bucket
        |  FROM perdoc)
        |SELECT bucket, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
        |  round(min(qsurp) / 1e6, 4) AS min_surprisal,
        |  round(max(qsurp) / 1e6, 4) AS max_surprisal
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    "text_zipf" ->
      """WITH terms AS (SELECT lower(t) AS term, count(*) AS f
        |  FROM documents,
        |    unnest(string_split_regex(trim(text), '\s+')) AS u(t)
        |  WHERE t <> '' GROUP BY 1),
        |top AS (SELECT term, f FROM terms ORDER BY f DESC, term LIMIT 1000),
        |rk AS (SELECT f, row_number() OVER (ORDER BY f DESC, term) AS r
        |  FROM top)
        |SELECT round(regr_slope(ln(f), ln(r)), 4) AS zipf_slope,
        |  round(regr_intercept(ln(f), ln(r)), 4) AS intercept,
        |  count(*) AS n_terms FROM rk""".stripMargin,

    "text_bm25" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
        |  WHERE tok IN ('spark', 'data', 'query') GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT t.doc_id,
        |    ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1) *
        |    (t.tf * 2.2) / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))
        |      AS sco
        |  FROM tf t JOIN dl l USING (doc_id) JOIN df d USING (tok)
        |  CROSS JOIN stats s)
        |SELECT doc_id, round(sum(sco), 4) AS bm25 FROM sc GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 50""".stripMargin,

    "text_mix_weights" ->
      """WITH per AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, n_docs, n_tokens,
        |    sqrt(CAST(n_tokens AS DOUBLE)) AS w_raw FROM per),
        |tot AS (SELECT sum(w_raw) AS w_tot, sum(n_tokens) AS tok_tot FROM w)
        |SELECT source, n_docs, n_tokens,
        |  round(n_tokens / tok_tot, 4) AS natural_share,
        |  round(w_raw / w_tot, 4) AS mix_weight
        |FROM w CROSS JOIN tot ORDER BY source""".stripMargin,

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
