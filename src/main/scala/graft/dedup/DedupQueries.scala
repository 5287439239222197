package graft.dedup

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** §2.5 — deduplication over `documents` / `embeddings`.
  *
  * dedup_minhash shares its oracle with dedup_jaccard: the LSH
  * parameters (64 hashes, 16 bands × 4) give miss probability
  * ≈ 4e-8 at jaccard 0.9 and the corpus' near-dup pairs all sit
  * ≥ 0.9, so candidates∩verify == the exact join — validated at
  * sf0.01, and the pipeline is fully deterministic (seeded hashes).
  */
object DedupQueries extends QueryModule {

  private val ShingleN = 3
  private val JThreshold = 0.5
  private val CThreshold = 0.7

  val queries: Map[String, Q] = Map(
    // Fuzzy dedup by edit distance with banded length blocking: each
    // doc emits its length-block ±1 on the probe side, the build side
    // keeps one block key — every |len diff| ≤ 10 pair meets in
    // EXACTLY one block (floors within 10/20 differ by ≤ 1), so the
    // quadratic levenshtein only runs inside (lang, ~20-char) blocks,
    // never doc × doc.
    "dedup_edit" -> ((s, d) => {
      import s.implicits._
      // bag-distance prefilter: per-doc lowercase letter histogram
      // (26 ints, computed ONCE per doc map-side). Every edit op
      // moves the histogram's L1 by at most 2 (substitution touches
      // two buckets, insert/delete one), so edit(a,b) ≥ L1(ha,hb)/2
      // — and coarsening (lowercasing, ignoring non-letters) only
      // shrinks L1, keeping the bound valid. Pairs with L1 > 60
      // cannot land within the 30-edit threshold and skip the DP
      // entirely: 63% of length-surviving pairs at sf0.1
      // (132k → 49k), measured 7.0 → ~3.5 s. Exactness unchanged —
      // every skipped pair would have returned -1.
      val letterHist = (lc: org.apache.spark.sql.Column) =>
        array((0 until 26).map { i =>
        (length(lc) - length(replace(lc, lit(('a' + i).toChar.toString),
          lit("")))).cast("int")
      }: _*)
      val docs = T.documents(s, d)
        .select($"doc_id", $"lang", $"n_chars", $"text",
          floor($"n_chars" / 20).as("blk0"),
          letterHist(lower($"text")).as("h"))
        // checkpointed: projection collapse otherwise re-derives the
        // 26-replace histogram expression PER PAIR above the join
        // (measured 18 s); blocks pin it at once-per-doc
        .localCheckpoint(false)
      val probe = docs.select($"doc_id".as("a_id"), $"lang",
        $"n_chars".as("a_chars"), $"text".as("a_text"), $"h".as("a_h"),
        explode(array($"blk0" - 1, $"blk0", $"blk0" + 1)).as("blk"))
      val build = docs.select($"doc_id".as("b_id"), $"lang",
        $"n_chars".as("b_chars"), $"text".as("b_text"), $"h".as("b_h"),
        $"blk0".as("blk"))
      // ONE filter, cheap-to-expensive: Catalyst pushes every
      // predicate into the join condition and EVALUATES THE CONJUNCTS
      // IN THE ORDER THE FILTER TREE HANDED THEM OVER — the stacked
      // filter/select form came out as (bagL1 AND levenshtein) AND
      // id AND length, running the DP on every raw joined row before
      // the guards that reject 80% of them (measured 18 s). A single
      // conjunction pins the order: id, length, codegen'd bag bound,
      // DP last. The ≤ 30 survivors recompute their distance in the
      // projection — pennies next to ordering the DP correctly.
      // bounded levenshtein: banded O(len·k) DP that bails at k,
      // vs O(len²) full DP. Returns -1 above the bound, exact within.
      probe.join(build, Seq("lang", "blk"))
        .filter($"a_id" < $"b_id" &&
          abs($"a_chars" - $"b_chars") <= 10 &&
          graft.functions.ArrayL1.of($"a_h", $"b_h") <= 60 &&
          levenshtein($"a_text", $"b_text", 30) >= 0)
        .select($"a_id", $"b_id",
          levenshtein($"a_text", $"b_text", 30).cast("long").as("lev"))
        .orderBy($"a_id", $"b_id")
    }),

    // Fuzzy ENTITY-name matching: sorted-neighborhood within
    // first-token blocks, scored with byte-exact Jaro-Winkler (the
    // codegen'd [[graft.functions.JaroWinkler]] — Spark has no
    // built-in Jaro; the DuckDB oracle replays its OWN
    // jaro_winkler_similarity, so byte-level parity is driver-gated,
    // not just spec-asserted). Naive within-block all-pairs is
    // QUADRATIC in block size (measured 0.9 → 32.7 s for 10× data
    // once blocks grew 10×); the sorted-neighborhood method compares
    // each name only to its w=10 lexicographic predecessors, so
    // comparisons are LINEAR in rows at any scale. The name-order
    // row number comes from the distributed Rank primitive (ordered
    // by a numeric 7-byte name prefix, tie-broken by the full name —
    // the same total order as ORDER BY name, so the oracle's plain
    // row_number() replays it), never a few-key window sort; the
    // neighbor pairing is a plain (blk, rn) equi-join.
    "dedup_jaro" -> ((s, d) => {
      import s.implicits._
      val p = T.part(s, d).select($"p_partkey", $"p_name",
        split($"p_name", " ").getItem(0).as("blk"),
        // big-endian numeric of the first 7 BYTES, zero-padded on the
        // right: byte-wise substring (not character-wise) keeps the
        // value ≤ 2^56 for any UTF-8 input, and the 0x00 pad makes
        // short names order by content, not length — so nk is
        // monotone in memcmp order for ANY name, matching both
        // Spark's and DuckDB's binary string collation. Ties (equal
        // 7-byte prefix) are broken by the full name in runningSums.
        conv(hex(rpad(substring($"p_name".cast("binary"), 1, 7), 7,
          Array[Byte](0))), 16, 10).cast("long").as("nk"))
      val rn = graft.operators.Rank
        .runningSums(p, Seq("blk"), "nk", Seq("p_name", "p_partkey"),
          Seq("rn" -> lit(1L)))
        .select($"blk", $"p_partkey", $"p_name", $"rn")
      val a = rn.select($"blk", $"rn",
        $"p_partkey".as("a_id"), $"p_name".as("a_name"))
      val b = rn.select($"blk",
          $"p_partkey".as("b_id"), $"p_name".as("b_name"),
          explode(sequence($"rn" - 10, $"rn" - 1)).as("rn"))
        .filter($"rn" >= 1)
      a.join(b, Seq("blk", "rn"))
        .withColumn("jw", graft.functions.JaroWinkler.of($"a_name", $"b_name"))
        .filter($"jw" >= 0.9)
        .groupBy($"blk")
        .agg(count(lit(1)).as("n_pairs"), r4(avg($"jw")).as("avg_jw"))
        .orderBy($"blk")
    }),

    "dedup_exact" -> ((s, d) => {
      import s.implicits._
      Dedup.exactGroups(T.documents(s, d), "doc_id", "text")
        .select($"keep_id", $"n_copies")
        .orderBy($"keep_id")
    }),

    "dedup_normalized" -> ((s, d) => {
      import s.implicits._
      Dedup.normalizedGroups(T.documents(s, d), "doc_id", "text")
        .select($"keep_id", $"n_copies")
        .orderBy($"keep_id")
    }),

    // ORACLE PATH, not the scale path: the standalone full-corpus
    // postings self-join is the exact reference that dedup_minhash is
    // validated against. At 100 TB pairwise Jaccard verification only
    // ever runs INSIDE LSH buckets (MinHash.nearDupPairs) — run this
    // form standalone only at oracle scale.
    "dedup_jaccard" -> ((s, d) => {
      import s.implicits._
      Dedup.jaccardPairs(T.documents(s, d), "doc_id", "text",
          ShingleN, JThreshold)
        .select($"a_id", $"b_id", r4($"jaccard").as("jaccard"))
        .orderBy($"a_id", $"b_id")
    }),

    "dedup_minhash" -> ((s, d) => {
      import s.implicits._
      MinHash.nearDupPairs(T.documents(s, d), "doc_id", "text",
          ShingleN, JThreshold)
        .select($"a_id", $"b_id", r4($"jaccard").as("jaccard"))
        .orderBy($"a_id", $"b_id")
    }),

    // Asymmetric CONTAINMENT near-dup (|A∩B| / min(|A|,|B|)): catches
    // the quote-inclusion case Jaccard misses — a short doc embedded
    // whole in a long one has Jaccard ≈ |A|/|B| (tiny) but
    // containment ≈ 1. Same linear inverted-index join as
    // dedup_jaccard; only the normalizer changes.
    "dedup_containment" -> ((s, d) => {
      import s.implicits._
      Dedup.containmentPairs(T.documents(s, d), "doc_id", "text",
          ShingleN, CThreshold)
        .select($"a_id", $"b_id", r4($"containment").as("containment"))
        .orderBy($"a_id", $"b_id")
    }),

    "dedup_simhash" -> ((s, d) => {
      import s.implicits._
      // md5-based fingerprints are engine-agnostic, so the oracle
      // recomputes them and brute-forces the pair set (complete for
      // hamming ≤ 3 by the 4-chunk pigeonhole the Spark side uses).
      SimHash.nearPairs(T.documents(s, d), "doc_id", "text", maxHamming = 3)
        .orderBy($"a_id", $"b_id")
    }),

    "dedup_embed" -> ((s, d) => {
      import s.implicits._
      Similarity.similarityJoin(T.embeddings(s, d), "vec_id",
          "embedding", threshold = 0.45)
        .select($"a_id", $"b_id", r4($"cos").as("cos"))
        .orderBy($"a_id", $"b_id")
    }),

    // SemDeDup-style semantic dedup (Abbas et al. 2023): coarse
    // k-means over the embeddings, then cosine pruning INSIDE each
    // cluster only — the quadratic pair work is bounded per cell, and
    // at 100 TB k grows with the corpus so cells stay executor-sized
    // (the paper's trick; cross-cluster near-dups are out of scope by
    // design). Removal policy: within a cluster a doc is removed iff
    // some LOWER-id doc sits at cosine ≥ eps (deterministic greedy;
    // the paper's keep-farthest-from-centroid is an arbitrary
    // tiebreak we replace with ids the oracle can replay). The
    // quantizer is the same deterministic Lloyd's as sim_topk_ivf, so
    // the oracle replays training + assignment + pruning exactly.
    "dedup_semdedup" -> ((s, d) => {
      import s.implicits._
      import graft.similarity.KMeans
      import graft.Util.cosine
      val emb = T.embeddings(s, d)
      val cents = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 3)
      val assign = emb.select($"vec_id",
          transform($"embedding", _.cast("double")).as("v"),
          KMeans.cellExpr($"embedding", cents).cast("long").as("cell"))
        .localCheckpoint(false)
      val a = assign.select($"cell", $"vec_id".as("a_id"), $"v".as("a_v"))
      val b = assign.select($"cell", $"vec_id".as("b_id"), $"v".as("b_v"))
      val removed = a.join(b, Seq("cell"))
        .filter($"a_id" < $"b_id" && cosine($"a_v", $"b_v") >= 0.45)
        .select($"cell", $"b_id").distinct()
      assign.groupBy($"cell").agg(count(lit(1)).as("n"))
        .join(removed.groupBy($"cell").agg(count(lit(1)).as("n_removed")),
          Seq("cell"), "left")
        .select($"cell", $"n",
          coalesce($"n_removed", lit(0L)).as("n_removed"))
        .orderBy($"cell")
    }),

    "dedup_clusters" -> ((s, d) => {
      import s.implicits._
      val pairs = Dedup.jaccardPairs(T.documents(s, d), "doc_id", "text",
        ShingleN, JThreshold)
      Dedup.connectedComponents(pairs, "a_id", "b_id")
        .select($"node", $"component")
        .orderBy($"node")
    }),

    // BEST-of-cluster selection — what production dedup actually
    // keeps: not the smallest id but the highest-QUALITY member of
    // each near-dup cluster (longest document here; integer word
    // count so the argmax is exact, ties break to the smaller id).
    // One struct-max aggregation per cluster (the q_argmax shape —
    // no window, no per-cluster sort), composed on the same
    // LSH-candidate + exact-verify pairs and distributed components
    // as dedup_clusters.
    "dedup_select" -> ((s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        ShingleN, JThreshold)
      val comps = Dedup.connectedComponents(pairs, "a_id", "b_id")
      val words = docs.select($"doc_id",
        size(split(trim($"text"), "\\s+")).cast("long").as("n_words"))
      comps.join(words, $"node" === $"doc_id")
        .groupBy($"component")
        .agg(count(lit(1)).as("n_members"),
          max(struct($"n_words", (-$"doc_id").as("nid"))).as("best"))
        .select($"component", $"n_members",
          (-$"best.nid").as("keeper"), $"best.n_words".as("keeper_words"))
        .orderBy($"component")
    }),

    // GROUP-AWARE train/test split: whole near-duplicate clusters
    // assign to one side (split keyed on the component id, never the
    // row), so no near-dup pair ever straddles the boundary — the
    // contamination a row-hash split silently creates when the corpus
    // holds near-copies (the reason eval decks dedup against training
    // data at all). Unpaired docs are their own singleton group.
    // Construction REQUIREs zero straddling pairs — the property
    // itself, not just the counts — and the oracle recomputes the
    // clusters independently (recursive CTE) so a wrong component
    // breaks the gate.
    "feat_group_split" -> ((s, d) => {
      import s.implicits._
      val docs = T.documents(s, d).select($"doc_id", $"text")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          ShingleN, JThreshold)
        .localCheckpoint(false) // feeds components AND the straddle check
      val comps = Dedup.connectedComponents(pairs, "a_id", "b_id")
      val labeled = docs.join(comps, $"doc_id" === $"node", "left_outer")
        .select($"doc_id",
          coalesce($"component", $"doc_id").as("grp"))
        .withColumn("split",
          when($"grp" % 5 < 4, "train").otherwise("test"))
        .localCheckpoint(false) // feeds the report AND the check
      val straddle = pairs
        .join(labeled.select($"doc_id".as("a_id"), $"split".as("sa")), "a_id")
        .join(labeled.select($"doc_id".as("b_id"), $"split".as("sb")), "b_id")
        .filter($"sa" =!= $"sb").count()
      require(straddle == 0,
        s"group split leaked: $straddle near-dup pairs straddle the boundary")
      labeled.groupBy($"split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"grp").as("n_groups"))
        .orderBy($"split")
    }),

    // Incremental crawl dedup — the day-N ingest (doc_id % 5 == 4,
    // ~20%) against the standing corpus: a batch doc survives only if
    // its normalized fingerprint is absent from the corpus (left_anti
    // on the hash — only fingerprints ever shuffle, never text) AND it
    // is the first copy within the batch. At 100 TB the corpus side is
    // the pre-computed fingerprint table every real pipeline already
    // maintains; the per-increment cost is one hash-keyed anti-join
    // sized by the DAY's data, not the corpus rescan dedup_exact pays.
    "dedup_incremental" -> ((s, d) => {
      import s.implicits._
      val docs = T.documents(s, d).select($"doc_id", $"source",
        md5(lower(regexp_replace(trim($"text"), "\\s+", " "))).as("h"))
      val corpus = docs.filter($"doc_id" % 5 =!= 4)
      val batch = docs.filter($"doc_id" % 5 === 4)
      val fresh = batch.join(corpus.select($"h").distinct(), Seq("h"),
        "left_anti")
      val keepIds = fresh.groupBy($"h").agg(min($"doc_id").as("keep_id"))
      batch.groupBy($"source").agg(count(lit(1)).as("n_batch"))
        .join(fresh.groupBy($"source")
          .agg(count(lit(1)).as("n_not_in_corpus")), Seq("source"), "left")
        .join(fresh.join(keepIds, Seq("h"))
          .filter($"doc_id" === $"keep_id")
          .groupBy($"source").agg(count(lit(1)).as("n_new_unique")),
          Seq("source"), "left")
        .select($"source", $"n_batch",
          coalesce($"n_not_in_corpus", lit(0L)).as("n_not_in_corpus"),
          coalesce($"n_new_unique", lit(0L)).as("n_new_unique"))
        .orderBy($"source")
    })
  )

  /** Shared CTE: exact shingle-jaccard pairs ≥ threshold. */
  private val pairsCte =
    s"""sh AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(
       |    generate_series(1, len(t)-${ShingleN - 1}),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
       |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
       |        FROM documents)
       |  WHERE len(t) >= $ShingleN),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT a_id, b_id, CAST(i AS DOUBLE)/(sa.n + sb.n - i) AS jaccard
       |  FROM inter
       |  JOIN sizes sa ON a_id = sa.doc_id
       |  JOIN sizes sb ON b_id = sb.doc_id
       |  WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= $JThreshold)""".stripMargin

  private val pairsSql =
    s"""WITH $pairsCte
       |SELECT a_id, b_id, round(jaccard, 4) AS jaccard FROM pairs
       |ORDER BY a_id, b_id""".stripMargin

  /** [[SimHash.fingerprints]] replayed in DuckDB: same md5-prefix
    * token hash, same majority-vote bit construction, then brute-force
    * hamming ≤ 3 pairs (equivalent to the Spark side's chunk join,
    * which is complete at that distance). */
  private val simhashSql = {
    val bits = SimHash.Bits
    val votes = (0 until bits)
      .map(b => s"sum((h >> $b) & 1) AS b$b").mkString(", ")
    val fp = (0 until bits)
      .map(b => s"(CASE WHEN 2 * b$b > n THEN (1::BIGINT << $b) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(string_split_regex(trim(text), '\\s+')) AS t
       |  FROM documents),
       |h AS (SELECT doc_id,
       |    ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
       |v AS (SELECT doc_id, count(*) AS n, $votes FROM h GROUP BY doc_id),
       |fp AS (SELECT doc_id, $fp AS simhash FROM v)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY a_id, b_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "dedup_jaro" ->
      """WITH p AS (
        |  SELECT p_partkey, p_name,
        |    string_split(p_name, ' ')[1] AS blk FROM part),
        |r AS (
        |  SELECT p_partkey, p_name, blk, row_number() OVER (
        |    PARTITION BY blk ORDER BY p_name, p_partkey) AS rn
        |  FROM p)
        |SELECT a.blk AS blk, count(*) AS n_pairs,
        |  round(avg(jaro_winkler_similarity(a.p_name, b.p_name)), 4)
        |    AS avg_jw
        |FROM r a JOIN r b
        |  ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 10
        |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.9
        |GROUP BY 1 ORDER BY blk""".stripMargin,

    "dedup_semdedup" ->
      s"""WITH emb AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |${graft.similarity.VectorOracles.kmeansCtes(16, 3)},
         |assign AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.cell) AS rn
         |    FROM emb e CROSS JOIN c3 c) WHERE rn = 1),
         |rem AS (
         |  SELECT DISTINCT a.cell, b.vec_id AS b_id
         |  FROM assign a JOIN assign b ON a.cell = b.cell
         |    AND a.vec_id < b.vec_id
         |  WHERE list_cosine_similarity(a.v, b.v) >= 0.45),
         |nn AS (SELECT cell, count(*) AS n FROM assign GROUP BY cell),
         |rr AS (SELECT cell, count(*) AS n_removed FROM rem GROUP BY cell)
         |SELECT nn.cell, nn.n, coalesce(rr.n_removed, 0) AS n_removed
         |FROM nn LEFT JOIN rr ON nn.cell = rr.cell
         |ORDER BY nn.cell""".stripMargin,

    "dedup_edit" ->
      """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev
        |FROM documents a JOIN documents b
        |  ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  AND abs(a.n_chars - b.n_chars) <= 10
        |WHERE levenshtein(a.text, b.text) <= 30
        |ORDER BY a_id, b_id""".stripMargin,

    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    "dedup_normalized" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |ORDER BY keep_id""".stripMargin,

    "dedup_jaccard" -> pairsSql,
    "dedup_minhash" -> pairsSql,

    "dedup_containment" ->
      s"""WITH sh AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(
         |    generate_series(1, len(t)-${ShingleN - 1}),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
         |        FROM documents)
         |  WHERE len(t) >= $ShingleN),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id,
         |  round(CAST(i AS DOUBLE)/least(sa.n, sb.n), 4) AS containment
         |FROM inter
         |JOIN sizes sa ON a_id = sa.doc_id
         |JOIN sizes sb ON b_id = sb.doc_id
         |WHERE CAST(i AS DOUBLE)/least(sa.n, sb.n) >= $CThreshold
         |ORDER BY a_id, b_id""".stripMargin,

    "dedup_embed" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.45
        |ORDER BY a_id, b_id""".stripMargin,

    "dedup_simhash" -> simhashSql,

    "dedup_clusters" ->
      s"""WITH RECURSIVE $pairsCte,
         |edges AS (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs),
         |nodes AS (SELECT DISTINCT src AS n FROM edges),
         |reach(n, m) AS (
         |  SELECT n, n FROM nodes
         |  UNION
         |  SELECT r.n, e.dst FROM reach r JOIN edges e ON r.m = e.src)
         |SELECT n AS node, min(m) AS component FROM reach
         |GROUP BY n ORDER BY node""".stripMargin,

    "dedup_select" ->
      s"""WITH RECURSIVE $pairsCte,
         |edges AS (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs),
         |nodes AS (SELECT DISTINCT src AS n FROM edges),
         |reach(n, m) AS (
         |  SELECT n, n FROM nodes
         |  UNION
         |  SELECT r.n, e.dst FROM reach r JOIN edges e ON r.m = e.src),
         |comps AS (SELECT n AS node, min(m) AS component FROM reach
         |  GROUP BY n),
         |w AS (SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
         |      AS n_words
         |  FROM documents),
         |m AS (SELECT c.component, w.doc_id, w.n_words
         |  FROM comps c JOIN w ON w.doc_id = c.node)
         |SELECT component, n_members, doc_id AS keeper,
         |  n_words AS keeper_words
         |FROM (
         |  SELECT component, doc_id, n_words,
         |    count(*) OVER (PARTITION BY component) AS n_members,
         |    row_number() OVER (PARTITION BY component
         |      ORDER BY n_words DESC, doc_id) AS rk
         |  FROM m)
         |WHERE rk = 1 ORDER BY component""".stripMargin,

    "feat_group_split" ->
      s"""WITH RECURSIVE $pairsCte,
         |edges AS (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs),
         |nodes AS (SELECT DISTINCT src AS n FROM edges),
         |reach(n, m) AS (
         |  SELECT n, n FROM nodes
         |  UNION
         |  SELECT r.n, e.dst FROM reach r JOIN edges e ON r.m = e.src),
         |comps AS (SELECT n AS node, min(m) AS component FROM reach
         |  GROUP BY n),
         |labeled AS (
         |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS grp
         |  FROM documents d LEFT JOIN comps c ON d.doc_id = c.node),
         |sp AS (
         |  SELECT doc_id, grp,
         |    CASE WHEN grp % 5 < 4 THEN 'train' ELSE 'test' END AS split
         |  FROM labeled)
         |SELECT split, count(*) AS n_docs,
         |  count(DISTINCT grp) AS n_groups
         |FROM sp GROUP BY split ORDER BY split""".stripMargin,

    "dedup_incremental" ->
      """WITH docs AS (SELECT doc_id, source,
        |    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h
        |  FROM documents),
        |corpus AS (SELECT DISTINCT h FROM docs WHERE doc_id % 5 <> 4),
        |batch AS (SELECT * FROM docs WHERE doc_id % 5 = 4),
        |fresh AS (SELECT b.* FROM batch b
        |  WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)),
        |keep AS (SELECT h, min(doc_id) AS keep_id FROM fresh GROUP BY h),
        |nb AS (SELECT source, count(*) AS n_batch FROM batch GROUP BY 1),
        |nf AS (SELECT source, count(*) AS n_not_in_corpus
        |  FROM fresh GROUP BY 1),
        |nu AS (SELECT f.source, count(*) AS n_new_unique
        |  FROM fresh f JOIN keep k ON f.h = k.h AND f.doc_id = k.keep_id
        |  GROUP BY 1)
        |SELECT nb.source, n_batch,
        |  coalesce(n_not_in_corpus, 0) AS n_not_in_corpus,
        |  coalesce(n_new_unique, 0) AS n_new_unique
        |FROM nb LEFT JOIN nf USING (source) LEFT JOIN nu USING (source)
        |ORDER BY source""".stripMargin
  )
}
