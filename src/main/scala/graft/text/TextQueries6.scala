package graft.text

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.7b — REAL byte-pair-encoding tokenization (reference analog:
  * the pipeline's datasets feed model training, where budgets are in
  * tokenizer tokens, not whitespace splits; airflow-setup.py:214-260
  * declares the training step this engine's data selection feeds).
  *
  * The encoder is the codegen'd [[graft.functions.BpeEncode]] under
  * the pinned [[Bpe.merges]] fixture; the oracle replays the merge
  * loop in DuckDB as a recursive CTE over the SAME 64 ranks, two
  * string-replaces per rank (the exactness argument — why 2× replace
  * reaches the greedy fixpoint — is documented at [[Bpe]]).
  *
  * Scale shape shared by all three keys: encode the DISTINCT word
  * vocabulary (tiny vs the corpus at any scale), broadcast-join the
  * per-word token count back to occurrences — the merge loop runs
  * |vocab| times total, never per occurrence. */
object TextQueries6 extends QueryModule {

  private val Budget = 1000 // BPE tokens per packed sequence

  /** (doc_id, source, w, cnt) distinct word occurrences WITH counts +
    * the encoded vocabulary — the scale shape of the whole family:
    * word-soup corpora repeat words heavily, so aggregating to the
    * (doc, word) histogram BEFORE the vocabulary join moves the join
    * and everything downstream off the raw token stream (the sf1
    * probe on the occurrence-level join read 8.4× for 10× data; this
    * shape re-pinned it ≤2.6×). */
  private def docWordsAndVocab(s: org.apache.spark.sql.SparkSession,
      d: String) = {
    import s.implicits._
    // checkpointed: the vocabulary build and the count consumer would
    // otherwise each re-run the explode-heavy scan+shuffle upstream
    // (the expensive arm of the whole family)
    val dw = T.documents(s, d)
      .select($"doc_id", $"source", explode(Bpe.words($"text")).as("w"))
      .groupBy($"doc_id", $"source", $"w")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val vocab = dw.select($"w").distinct()
      .select($"w", Bpe.encode($"w").as("toks"))
    (dw, vocab)
  }

  val queries: Map[String, Q] = Map(
    // Per-source BPE token accounting: the number every data-mixing /
    // budget decision keys on. words vs bpe_tokens also exposes the
    // corpus' compression ratio under the fixture.
    "text_bpe" -> ((s, d) => {
      import s.implicits._
      val (dw, vocab) = docWordsAndVocab(s, d)
      dw.join(broadcast(vocab.select($"w", size($"toks").as("w_tokens"))),
          Seq("w"))
        .groupBy($"source")
        .agg(countDistinct($"doc_id").as("n_docs"),
          sum($"w_tokens" * $"cnt").as("bpe_tokens"),
          sum($"cnt").as("words"))
        .orderBy($"source")
    }),

    // Corpus token-frequency head: the 15 most frequent BPE TOKENS
    // (not words) — verifies token IDENTITIES, not just counts, so a
    // subtly wrong merge order fails the hash even when lengths
    // agree. Token rows explode from the VOCABULARY weighted by the
    // corpus word counts — never from the occurrence stream.
    "text_bpe_vocab" -> ((s, d) => {
      import s.implicits._
      val (dw, vocab) = docWordsAndVocab(s, d)
      val wordCounts = dw.groupBy($"w").agg(sum($"cnt").as("wc"))
      wordCounts.join(broadcast(vocab), Seq("w"))
        .select($"wc", explode($"toks").as("token"))
        .groupBy($"token").agg(sum($"wc").as("n"))
        .orderBy(desc("n"), $"token")
        .limit(15)
    }),

    // Sequence packing in TRUTHFUL units: text_pack's contiguous
    // greedy prefix-sum bins, but the budget is spent in BPE tokens —
    // the unit the training run actually packs context windows with.
    "text_pack_bpe" -> ((s, d) => {
      import s.implicits._
      val (dw, vocab) = docWordsAndVocab(s, d)
      val docs = dw
        .join(broadcast(vocab.select($"w", size($"toks").as("w_tokens"))),
          Seq("w"))
        .groupBy($"source", $"doc_id")
        .agg(sum($"w_tokens" * $"cnt").as("n_tok"))
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      docs.withColumn("cum", sum($"n_tok").over(w) - $"n_tok")
        .withColumn("bin", floor($"cum" / Budget).cast("long"))
        .groupBy($"source", $"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("bin_tokens"))
        .orderBy($"source", $"bin")
    })
  )

  /** The merge table as a recursive-CTE VALUES literal + the shared
    * encoding replay (see [[Bpe]] for why 2× replace is exact). */
  private val mergeValues = Bpe.merges.zipWithIndex.map {
    case ((a, b), i) => s"(${i + 1}, '|$a|$b|', '|$a$b|')"
  }.mkString(",\n        ")
  private val ranks = Bpe.merges.size

  private def replay(tail: String) =
    s"""WITH RECURSIVE m(r, pat, rep) AS (VALUES
       |        $mergeValues),
       |occ AS (
       |  SELECT doc_id, source,
       |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents),
       |vocab AS (SELECT DISTINCT w FROM occ),
       |enc(w, s, r) AS (
       |  SELECT w, '|' || regexp_replace(w, '(.)', '\\1|', 'g'), 0 FROM vocab
       |  UNION ALL
       |  SELECT e.w, replace(replace(e.s, m.pat, m.rep), m.pat, m.rep),
       |    e.r + 1
       |  FROM enc e JOIN m ON m.r = e.r + 1 WHERE e.r < $ranks),
       |fin AS (
       |  SELECT w, s,
       |    length(s) - length(replace(s, '|', '')) - 1 AS w_tokens
       |  FROM enc WHERE r = $ranks)
       |$tail""".stripMargin

  val oracles: Map[String, String] = Map(
    "text_bpe" -> replay(
      """SELECT source, count(DISTINCT doc_id) AS n_docs,
        |  CAST(sum(w_tokens) AS BIGINT) AS bpe_tokens,
        |  count(*) AS words
        |FROM occ JOIN fin USING (w)
        |GROUP BY source ORDER BY source""".stripMargin),

    "text_bpe_vocab" -> replay(
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split(s, '|'),
        |    x -> x <> '')) AS token
        |  FROM occ JOIN fin USING (w))
        |GROUP BY token ORDER BY n DESC, token LIMIT 15""".stripMargin),

    "text_pack_bpe" -> replay(
      """, docs AS (
        |  SELECT source, doc_id, CAST(sum(w_tokens) AS BIGINT) AS n_tok
        |  FROM occ JOIN fin USING (w)
        |  GROUP BY source, doc_id),
        |binned AS (
        |  SELECT source, doc_id, n_tok,
        |    CAST(floor((sum(n_tok) OVER (PARTITION BY source
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      1 PRECEDING)) / 1000.0) AS BIGINT) AS bin
        |  FROM docs)
        |SELECT source, coalesce(bin, 0) AS bin, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS bin_tokens
        |FROM binned GROUP BY source, coalesce(bin, 0)
        |ORDER BY source, bin""".stripMargin)
  )
}
