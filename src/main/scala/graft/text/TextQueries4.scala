package graft.text

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for pretraining pipelines:
  * train/eval contamination detection and sequence packing.
  *
  * Contamination is the LSH-free cousin of dedup: the eval split is
  * tiny relative to a 100 TB train corpus, so the distinct eval
  * shingle set stays small and the overlap check is a semi-join keyed
  * on the shingle — one shuffle, linear in the train token stream
  * (broadcastable when the eval side fits).
  *
  * Packing assigns documents to fixed-token-budget bins with a
  * per-source prefix sum — partitioned by source, so no global sort;
  * at 100 TB the window runs per source shard and the output bin
  * stats are a map-side-combinable aggregate.
  */
object TextQueries4 extends QueryModule {

  private val N = 5         // shingle width (word 5-grams)
  private val Budget = 1000 // tokens per packed sequence

  val queries: Map[String, Q] = Map(
    // Per-document novelty vs the whole corpus: the fraction of a
    // doc's distinct word-trigram shingles that no other document
    // contains. The df-join formulation — postings (doc, shingle),
    // document frequency per shingle, join back, per-doc aggregate —
    // is linear in total postings with two hash shuffles (by shingle,
    // by doc); shingles travel as the codegen'd 64-bit ShingleHashes
    // keys, never as strings. A low-novelty doc is boilerplate or a
    // near-copy: the standard pretraining-corpus quality signal
    // between exact dedup and MinHash.
    //
    // Negative results (r14, each measured min-of-4 at sf0.1 against
    // this form's 1.34 s): (a) df via a full-frame window over the
    // shingle key — 1.55 s; the window SORTS the postings by a
    // millions-of-distinct-values key where the hash aggregate never
    // sorts anything. (b) n_shared = n_shingles − n_unique with
    // map-side sizes and df-1 owners — 1.89 s when the two arms
    // re-shingled the text, and still 1.90 s with the distinct-set
    // ARRAYS checkpointed once (array-of-longs rows materialize the
    // same postings volume in a worse shape than the exploded 8-byte
    // pairs). The df-join stands.
    "text_novelty" -> ((s, d) => {
      import s.implicits._
      val post = graft.dedup.Dedup.shinglePostings(
          graft.Util.ensureParallelism(T.documents(s, d)),
          "doc_id", "text", 3)
        .localCheckpoint(false)
      val docFreq = post.groupBy($"shingle").agg(count(lit(1)).as("sdf"))
      post.join(docFreq, "shingle")
        .groupBy($"__id".as("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when($"sdf" >= 2, 1L).otherwise(0L)).as("n_shared"))
        .withColumn("novelty",
          r4(lit(1.0) - $"n_shared".cast("double") / $"n_shingles"))
        .orderBy($"doc_id")
    }),

    // Even doc_ids play the train corpus, odd the held-out eval set.
    // A shingle of an eval doc is "contaminated" if any train doc
    // contains it; report per-eval-doc contamination ratio.
    "text_contamination" -> ((s, d) => {
      import s.implicits._
      // Single lineage — ONE scan, one shingle evaluation: explode
      // postings (explode_outer so Catalyst doesn't push a duplicate
      // of the whole shingle pipeline into a pre-generator filter),
      // distinct (doc, shingle) pairs, then a window keyed on the
      // shingle marks train membership — the semi-join without a
      // second derivation of the corpus.
      // Shingles come from the codegen'd [[graft.functions.ShingleHashes]]
      // expression — one pass over the bytes, 64-bit keys, no
      // intermediate token/slice arrays — so the exchanges carry
      // 8-byte longs and the map side is a single tight loop.
      val pairs = graft.Util.ensureParallelism(T.documents(s, d))
        .select($"doc_id", explode_outer(
          graft.functions.ShingleHashes.of($"text", N)).as("h"))
        .filter($"h".isNotNull)
        .distinct()
      val flagged = pairs.withColumn("in_train",
        max(when($"doc_id" % 2 === 0, 1).otherwise(0))
          .over(Window.partitionBy($"h")))
      flagged.filter($"doc_id" % 2 === 1)
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          count_if($"in_train" === 1).as("n_contaminated"))
        .select($"doc_id", $"n_shingles", $"n_contaminated",
          r4($"n_contaminated".cast("double") / $"n_shingles")
            .as("contamination"))
        .orderBy($"doc_id")
    }),

    // Sparse TF-IDF document similarity — the inverted-index
    // counterpart of dense embedding cosine: postings join on the
    // term, never doc×doc. The df window [2, 20] drops un-pairable
    // singletons AND hot terms, so per-term pair fanout is bounded —
    // the knob that keeps the posting join linear-ish at corpus
    // scale. Norms use the same filtered weights (cosine over the
    // mid-df term space).
    "text_sim_sparse" -> ((s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
      // bigram terms: the unigram vocabulary of this corpus is tiny
      // (~31 words, all stopword-grade df); bigrams give the
      // discriminative mid-df term space sparse cosine needs
      val terms = TextAnalysis.shingleDocs(docs, "doc_id", "text", 2)
        .select($"__id".as("doc_id"),
          explode_outer($"__shingles").as("t"))
        .filter($"t".isNotNull)
        .select($"doc_id", lower($"t").as("term"))
      // checkpointed: broadcast(dfreq) materializes in its OWN plan
      // execution, which would re-run the whole shingle + tf pipeline
      // a second time (broadcast reuse never spans plan executions —
      // the q_mad lesson); blocks pin it at once
      val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(false)
      val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val n = docs.agg(countDistinct($"doc_id").as("n"))
      val wtd = tf.join(broadcast(dfreq), "term")
        .filter($"df".between(2, 100))
        .crossJoin(broadcast(n))
        .select($"doc_id", $"term", ($"tf" * log($"n" / $"df")).as("wt"))
      val norms = wtd.groupBy($"doc_id")
        .agg(sqrt(sum($"wt" * $"wt")).as("norm"))
      wtd.as("a").join(wtd.as("b"),
          $"a.term" === $"b.term" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .agg(sum($"a.wt" * $"b.wt").as("dot"))
        .join(norms.select($"doc_id".as("d1"), $"norm".as("n1")), "d1")
        .join(norms.select($"doc_id".as("d2"), $"norm".as("n2")), "d2")
        .select($"d1", $"d2", r4($"dot" / ($"n1" * $"n2")).as("cos"))
        .orderBy($"cos".desc, $"d1", $"d2")
        .limit(15)
    }),

    // Corpus-level overlap between sources: Jaccard of each source
    // pair's distinct 5-gram sets. The shingle equi-join groups
    // postings by shingle (linear; per-shingle fanout bounded by the
    // source count, not the corpus), and set sizes broadcast onto the
    // tiny pair table — the cross-source dedup heatmap at 100 TB.
    "text_source_overlap" -> ((s, d) => {
      import s.implicits._
      // NOT checkpointed (measured 0.71 → 1.16 s): materializing the
      // distinct (source, shingle) set into the block store costs
      // more than the broadcast arms' re-derivation saves — the
      // postings-shaped lesson again; contrast text_sim_sparse, whose
      // checkpointed tf frame is doc×term-sized, far smaller than its
      // shingle pipeline
      val sh = graft.Util.ensureParallelism(T.documents(s, d))
        .select($"source", explode_outer(
          graft.functions.ShingleHashes.of($"text", N)).as("sh"))
        .filter($"sh".isNotNull)
        .distinct()
      val inter = sh.as("a").join(sh.as("b"),
          $"a.sh" === $"b.sh" && $"a.source" < $"b.source")
        .groupBy($"a.source".as("s1"), $"b.source".as("s2"))
        .agg(count(lit(1)).as("inter"))
      val sizes = sh.groupBy($"source").agg(count(lit(1)).as("sz"))
      inter
        .join(broadcast(sizes.select($"source".as("s1"), $"sz".as("sz1"))), "s1")
        .join(broadcast(sizes.select($"source".as("s2"), $"sz".as("sz2"))), "s2")
        .select($"s1", $"s2", $"inter",
          r4($"inter".cast("double") / ($"sz1" + $"sz2" - $"inter"))
            .as("jaccard"))
        .orderBy($"s1", $"s2")
    }),

    // Pack docs into Budget-token sequences: per source, in doc_id
    // order, bin = exclusive-prefix-sum(tokens) div Budget. Contiguous
    // greedy fill — each bin overflows at most one document past the
    // budget, and bin membership is a pure function of the prefix sum.
    "text_pack" -> ((s, d) => {
      import s.implicits._
      val docs = T.documents(s, d).select($"source", $"doc_id",
        size(graft.Util.tokens($"text")).cast("long").as("n_tok"))
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      docs.withColumn("cum", sum($"n_tok").over(w) - $"n_tok")
        .withColumn("bin", floor($"cum" / Budget).cast("long"))
        .groupBy($"source", $"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("bin_tokens"))
        .orderBy($"source", $"bin")
    }),

    // Quality-ranked data selection under a per-source token budget:
    // keep each source's most lexically diverse docs (distinct-token
    // ratio, doc_id tie-break) until 20% of its tokens are spent —
    // the "select the best X% of the crawl" stage of a pretraining
    // mix. Ordering + running totals via the distributed rank
    // primitive: no per-source single-task sort at any corpus size,
    // and the budget cut is a filter on the running sum, not a limit.
    "text_token_budget" -> ((s, d) => {
      import s.implicits._
      val toks = graft.Util.tokens($"text")
      val docs = T.documents(s, d).select($"doc_id", $"source",
          size(toks).cast("long").as("n_tok"),
          (size(array_distinct(toks)).cast("double") / size(toks))
            .as("score"))
        .withColumn("negscore", -$"score")
      graft.operators.Rank.runningSums(docs, Seq("source"), "negscore",
          Seq("doc_id"), Seq("cum_tok" -> col("n_tok")))
        .filter($"cum_tok" <= lit(0.2) * $"cum_tok_total")
        .groupBy($"source").agg(
          count(lit(1)).as("n_docs"),
          sum($"n_tok").as("kept_tokens"),
          r4(sum($"n_tok") / max($"cum_tok_total").cast("double"))
            .as("kept_share"))
        .orderBy($"source")
    })
  )

  val oracles: Map[String, String] = Map(
    "text_novelty" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, unnest(list_transform(
        |    generate_series(1, len(t)-2),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |        FROM documents)
        |  WHERE len(t) >= 3),
        |docfreq AS (SELECT shingle, count(*) AS sdf FROM sh GROUP BY shingle)
        |SELECT s.doc_id, count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN d.sdf >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_shared,
        |  round(1.0 - CAST(sum(CASE WHEN d.sdf >= 2 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / count(*), 4) AS novelty
        |FROM sh s JOIN docfreq d ON s.shingle = d.shingle
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "text_contamination" ->
      """WITH toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh AS (SELECT doc_id, array_to_string(t[g:g+4], ' ') AS sh
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, len(t) - 4)) AS g
        |        FROM toks)),
        |train AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 2 = 0),
        |ev AS (SELECT DISTINCT doc_id, sh FROM sh WHERE doc_id % 2 = 1),
        |tot AS (SELECT doc_id, count(*) AS n_shingles FROM ev GROUP BY 1),
        |hit AS (SELECT doc_id, count(*) AS n_contaminated FROM ev
        |  WHERE sh IN (SELECT sh FROM train) GROUP BY 1)
        |SELECT t.doc_id, t.n_shingles,
        |  CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
        |  round(coalesce(h.n_contaminated, 0) / CAST(t.n_shingles AS DOUBLE), 4)
        |    AS contamination
        |FROM tot t LEFT JOIN hit h USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "text_sim_sparse" ->
      """WITH toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS t FROM documents),
        |terms AS (SELECT doc_id,
        |    lower(array_to_string(t[g:g+1], ' ')) AS term
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, len(t) - 1)) AS g
        |        FROM toks)),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |wtd AS (SELECT doc_id, term, tf * ln(n.n / df) AS wt
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
        |  WHERE df BETWEEN 2 AND 100),
        |norms AS (SELECT doc_id, sqrt(sum(wt * wt)) AS norm
        |  FROM wtd GROUP BY 1),
        |dots AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    sum(a.wt * b.wt) AS dot
        |  FROM wtd a JOIN wtd b
        |    ON a.term = b.term AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, round(dot / (z1.norm * z2.norm), 4) AS cos
        |FROM dots
        |JOIN norms z1 ON z1.doc_id = d1
        |JOIN norms z2 ON z2.doc_id = d2
        |ORDER BY cos DESC, d1, d2 LIMIT 15""".stripMargin,

    "text_source_overlap" ->
      """WITH toks AS (SELECT doc_id, source,
        |    string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh AS (SELECT DISTINCT source, array_to_string(t[g:g+4], ' ') AS sh
        |  FROM (SELECT source, t,
        |          unnest(generate_series(1, len(t) - 4)) AS g
        |        FROM toks)),
        |inter AS (SELECT a.source AS s1, b.source AS s2, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2),
        |sizes AS (SELECT source, count(*) AS sz FROM sh GROUP BY 1)
        |SELECT s1, s2, inter,
        |  round(inter / CAST(z1.sz + z2.sz - inter AS DOUBLE), 4) AS jaccard
        |FROM inter
        |JOIN sizes z1 ON z1.source = s1
        |JOIN sizes z2 ON z2.source = s2
        |ORDER BY s1, s2""".stripMargin,

    "text_pack" ->
      """WITH docs AS (SELECT source, doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |cum AS (SELECT source, doc_id, n_tok,
        |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok AS cum
        |  FROM docs)
        |SELECT source, CAST(floor(cum / 1000.0) AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS bin_tokens
        |FROM cum GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,

    // CAST(0.2 AS DOUBLE) is load-bearing: bare 0.2 is DECIMAL in
    // DuckDB and a budget-boundary doc could flip between engines
    "text_token_budget" ->
      """WITH docs AS (SELECT doc_id, source,
        |    CAST(len(t) AS BIGINT) AS n_tok,
        |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS score
        |  FROM (SELECT doc_id, source,
        |          string_split_regex(trim(text), '\s+') AS t
        |        FROM documents)),
        |r AS (SELECT source, n_tok,
        |    sum(n_tok) OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id) AS cum_tok,
        |    sum(n_tok) OVER (PARTITION BY source) AS tot
        |  FROM docs)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS kept_tokens,
        |  round(CAST(sum(n_tok) AS DOUBLE) / max(tot), 4) AS kept_share
        |FROM r WHERE cum_tok <= CAST(0.2 AS DOUBLE) * tot
        |GROUP BY 1 ORDER BY source""".stripMargin
  )
}
