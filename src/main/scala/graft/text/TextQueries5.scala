package graft.text

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._

/** Cross-document duplicate-span analysis — the C4/RefinedWeb-style
  * "remove any span that occurs verbatim in another document" signal,
  * computed as the fraction of each document's 8-token chunks whose
  * chunk also appears in at least one OTHER document.
  *
  * Scale shape: chunks become 60-bit md5 prefixes immediately after
  * extraction, so the chunk shuffle carries (doc_id, int64) pairs,
  * never strings; the global document-frequency table is chunk-keyed
  * and joins back on the integer. Chunk extraction is a single
  * generator pass (size-8 windows, ~tokens-per-doc instances), linear
  * in corpus tokens. Reference behavior: corpus-level text hygiene of
  * the reference's dataset prep (aws_infrastructure/
  * airflow-setup.py:172-241).
  */
object TextQueries5 extends QueryModule {

  val queries: Map[String, Q] = Map(
    // The full Gopher quality-rule gate (Rae et al. 2021, adapted to
    // deterministic cross-engine arithmetic): per source, how many
    // documents pass EACH rule and how many pass ALL — the
    // pretraining-corpus admission report. Every rule is a pure
    // column expression over one documents scan (word count bounds,
    // mean word length bounds, alphabetic-token fraction, stopword
    // floor, symbol-to-word ceiling); the funnel is conditional
    // counting, one shuffle of (source, partials).
    "text_gopher_gate" -> ((s, d) => {
      import s.implicits._
      val t = $"text"
      val toks = TextAnalysis.tokens(t)
      val n = size(toks)
      val meanLen = aggregate(transform(toks, x => length(x).cast("long")),
        lit(0L), (a, e) => a + e).cast("double") / n
      val alphaFrac = size(filter(toks,
        x => lower(x).rlike("[a-z]"))).cast("double") / n
      val stopN = TextAnalysis.stopwordCount(t)
      val symFrac = regexp_count(t, lit("#|\\.\\.\\.|…")).cast("double") / n
      T.documents(s, d).select($"source",
          (n >= 50 && n <= 100000).as("w_ok"),
          (meanLen >= 3.0 && meanLen <= 10.0).as("l_ok"),
          (alphaFrac >= 0.7).as("a_ok"),
          (stopN >= 2).as("s_ok"),
          (symFrac < 0.1).as("y_ok"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          count_if($"w_ok").as("n_words_ok"),
          count_if($"l_ok").as("n_wordlen_ok"),
          count_if($"a_ok").as("n_alpha_ok"),
          count_if($"s_ok").as("n_stopword_ok"),
          count_if($"y_ok").as("n_symbol_ok"),
          count_if($"w_ok" && $"l_ok" && $"a_ok" && $"s_ok" && $"y_ok")
            .as("n_pass_all"),
          r4(count_if($"w_ok" && $"l_ok" && $"a_ok" && $"s_ok" && $"y_ok")
            .cast("double") / count(lit(1))).as("retention"))
        .orderBy($"source")
    }),

    "text_dup_spans" -> ((s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
      // n_chunks needs no chunk pass at all: a doc of n tokens has
      // exactly n-7 size-8 windows
      val docN = docs
        .select($"doc_id",
          (size(split(lower($"text"), " ")) - 7).cast("long").as("n_chunks"))
        .filter($"n_chunks" >= 1)
      // codegen'd one-pass extraction (empty array under 8 tokens, so
      // explode drops short docs without a separate filter); the
      // composable md5-over-slice lambda was ~60% of the sf1 runtime
      val chunks = docs.select($"doc_id",
        explode(graft.functions.ChunkMd5Hashes.of($"text", 8)).as("h"))
      // ONE h-keyed shuffle carries the whole chunk volume: hash(h)
      // partitioning satisfies both the (h, doc_id) grouping (h is a
      // subset of the keys) and the h-partitioned window, so the
      // within-doc collapse and the document-frequency count run on
      // the same exchange. The previous shape shuffled the full chunk
      // volume three times (distinct, groupBy h, join-back); window
      // partitions are df-sized (the docs sharing one chunk), so
      // parallelism stays chunk-cardinality wide.
      val perDoc = chunks.repartition($"h")
        .groupBy($"h", $"doc_id").agg(count(lit(1)).as("c"))
      val dfWin = org.apache.spark.sql.expressions.Window.partitionBy($"h")
      val dup = perDoc
        .withColumn("df", count(lit(1)).over(dfWin))
        .filter($"df" >= 2)
        .groupBy($"doc_id").agg(sum($"c").as("n_dup"))
      docN.join(dup, Seq("doc_id"), "left")
        .select($"doc_id", $"n_chunks",
          coalesce($"n_dup", lit(0L)).as("n_dup"),
          r4(coalesce($"n_dup", lit(0L)) / $"n_chunks".cast("double"))
            .as("dup_frac"))
        .orderBy($"doc_id")
    }),

    // RAG-style sliding-window chunking: each document split into
    // overlapping retrieval chunks of W=32 tokens at stride 24
    // (overlap 8 — the boundary-context rule every retrieval pipeline
    // applies so an answer spanning a cut survives in one piece).
    // Chunk count is closed-form (1 if n ≤ W else ⌈(n−W)/stride⌉+1 —
    // the last window covers the tail, no contained-in-predecessor
    // stub chunks), each chunk is a 1-based slice, and the gate
    // hashes the chunk TEXT (md5 of the space-joined tokens), so an
    // off-by-one anywhere in the window math flips a hash. Scale
    // shape: sequence+slice+md5 are all codegen'd array expressions
    // inside one projection — ZERO shuffles until the output sort;
    // chunking 100 TB is embarrassingly parallel and the explode
    // multiplies rows by ~n/stride, the same fanout the downstream
    // embedding step pays anyway.
    "text_chunks" -> ((s, d) => {
      import s.implicits._
      val W = 32
      val S = 24
      val toks = Bpe.words($"text")
      T.documents(s, d)
        .select($"doc_id", toks.as("ts"))
        .withColumn("n", size($"ts"))
        .withColumn("n_chunks",
          when($"n" <= W, lit(1L)).otherwise(
            ceil(($"n" - W).cast("double") / S).cast("long") + 1L))
        .select($"doc_id", $"ts", $"n",
          explode(sequence(lit(0L), $"n_chunks" - 1L)).as("chunk_idx"))
        .withColumn("chunk",
          slice($"ts", ($"chunk_idx" * S + 1).cast("int"),
            least(lit(W), greatest($"n" - $"chunk_idx".cast("int") * S,
              lit(0))).cast("int")))
        .select($"doc_id", $"chunk_idx",
          size($"chunk").cast("long").as("n_tok"),
          md5(concat_ws(" ", $"chunk")).as("chunk_hash"))
        .orderBy($"doc_id", $"chunk_idx")
    })
  )

  val oracles: Map[String, String] = Map(
    "text_gopher_gate" ->
      """WITH f AS (
        |  SELECT source, text,
        |    string_split_regex(trim(text), '\s+') AS t FROM documents),
        |m AS (
        |  SELECT source,
        |    len(t) AS n,
        |    list_sum(list_transform(t, x -> len(x)))
        |      / CAST(len(t) AS DOUBLE) AS mw,
        |    len(list_filter(t, x -> regexp_matches(lower(x), '[a-z]')))
        |      / CAST(len(t) AS DOUBLE) AS af,
        |    len(regexp_extract_all(lower(text),
        |      '\b(?:the|a|an|and|or|of|to|in|is|it)\b')) AS stop_n,
        |    len(regexp_extract_all(text, '#|\.\.\.|…'))
        |      / CAST(len(t) AS DOUBLE) AS yf
        |  FROM f),
        |r AS (
        |  SELECT source,
        |    (n BETWEEN 50 AND 100000) AS w_ok,
        |    (mw >= 3.0 AND mw <= 10.0) AS l_ok,
        |    (af >= 0.7) AS a_ok,
        |    (stop_n >= 2) AS s_ok,
        |    (yf < 0.1) AS y_ok
        |  FROM m)
        |SELECT source, count(*) AS n_docs,
        |  CAST(count(*) FILTER (w_ok) AS BIGINT) AS n_words_ok,
        |  CAST(count(*) FILTER (l_ok) AS BIGINT) AS n_wordlen_ok,
        |  CAST(count(*) FILTER (a_ok) AS BIGINT) AS n_alpha_ok,
        |  CAST(count(*) FILTER (s_ok) AS BIGINT) AS n_stopword_ok,
        |  CAST(count(*) FILTER (y_ok) AS BIGINT) AS n_symbol_ok,
        |  CAST(count(*) FILTER (w_ok AND l_ok AND a_ok AND s_ok AND y_ok)
        |    AS BIGINT) AS n_pass_all,
        |  round(count(*) FILTER (w_ok AND l_ok AND a_ok AND s_ok AND y_ok)
        |    / CAST(count(*) AS DOUBLE), 4) AS retention
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "text_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t
        |  FROM documents WHERE len(string_split(lower(text), ' ')) >= 8),
        |chunks AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT) AS h
        |  FROM toks, LATERAL unnest(generate_series(1, len(t) - 7)) AS g(i)),
        |df AS (SELECT h, count(DISTINCT doc_id) AS df FROM chunks GROUP BY 1)
        |SELECT doc_id, count(*) AS n_chunks,
        |  count(*) FILTER (df >= 2) AS n_dup,
        |  round(count(*) FILTER (df >= 2) / CAST(count(*) AS DOUBLE), 4)
        |    AS dup_frac
        |FROM chunks JOIN df USING (h)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // the same window math replayed over DuckDB lists: 1-based
    // inclusive list_slice end = min(start + W - 1, n) ≡ Spark's
    // slice(start, length = min(W, n - start + 1))
    "text_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ts
        |  FROM documents),
        |dims AS (
        |  SELECT doc_id, ts, len(ts) AS n,
        |    CASE WHEN len(ts) <= 32 THEN 1
        |      ELSE CAST(ceil((len(ts) - 32) / 24.0) AS BIGINT) + 1
        |    END AS n_chunks
        |  FROM toks),
        |ch AS (
        |  SELECT doc_id, i AS chunk_idx,
        |    list_slice(ts, i*24 + 1, least(i*24 + 32, n)) AS chunk
        |  FROM dims,
        |    LATERAL unnest(generate_series(0, n_chunks - 1)) AS t(i))
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(len(chunk) AS BIGINT) AS n_tok,
        |  md5(array_to_string(chunk, ' ')) AS chunk_hash
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin
  )
}
