package graft.similarity

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._

/** §2.6 — similarity search over `embeddings`. */
object SimilarityQueries extends QueryModule {

  /** Embedding dimensionality of the test corpus (TESTDATA.md). */
  val EmbDim = 64

  val queries: Map[String, Q] = Map(
    "sim_topk_brute" -> ((s, d) => {
      import s.implicits._
      val emb = T.embeddings(s, d)
      Similarity.bruteTopK(emb, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", k = 10)
        .select($"qid", $"nid", r4($"cos").as("cos"), $"rank".cast("long").as("rank"))
        .orderBy($"qid", $"rank")
    }),

    "sim_join" -> ((s, d) => {
      import s.implicits._
      Similarity.similarityJoin(T.embeddings(s, d), "vec_id",
          "embedding", threshold = 0.4)
        .select($"a_id", $"b_id", r4($"cos").as("cos"))
        .orderBy($"a_id", $"b_id")
    }),

    "sim_topk_lsh" -> ((s, d) => {
      import s.implicits._
      // Deterministic literal hyperplanes → the oracle replays the
      // identical bucket routing; recall vs brute force is asserted
      // in SimilaritySpec.
      val emb = T.embeddings(s, d)
      Similarity.lshTopK(emb, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", k = 10, dim = EmbDim,
          nPlanes = 4, nTables = 16)
        .select($"qid", $"nid", r4($"cos").as("cos"), $"rank".cast("long").as("rank"))
        .orderBy($"qid", $"rank")
    }),

    // Recall@10 of the LSH index against exact brute force — the
    // evaluation loop an ANN deployment runs before trusting the
    // index. Both paths are the already-oracle-verified ones; the
    // metric is their per-query overlap, so the oracle replays the
    // identical composition.
    "sim_recall_at_k" -> ((s, d) => {
      import s.implicits._
      val emb = T.embeddings(s, d)
      val q = emb.filter($"vec_id" < 10)
      val brute = Similarity.bruteTopK(emb, q, "vec_id", "embedding", k = 10)
        .select($"qid", $"nid")
      val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding",
          k = 10, dim = EmbDim, nPlanes = 4, nTables = 16)
        .select($"qid", $"nid", lit(1L).as("hit"))
      brute.join(lsh, Seq("qid", "nid"), "left_outer")
        .groupBy($"qid").agg(sum(coalesce($"hit", lit(0L))).as("hits"))
        .agg(count(lit(1)).as("n_queries"),
          r4(avg($"hits" / 10.0)).as("recall_at_10"))
    }),

    "sim_topk_ivf" -> ((s, d) => {
      import s.implicits._
      // Deterministic Lloyd's quantizer (fixed init + iteration
      // count) → the oracle replays the same k-means in unrolled SQL,
      // probing 4 of 16 cells.
      val emb = T.embeddings(s, d)
      Similarity.ivfTopK(emb, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", k = 10, nCells = 16, nprobe = 4,
          kmeansIters = 3)
        .select($"qid", $"nid", r4($"cos").as("cos"), $"rank".cast("long").as("rank"))
        .orderBy($"qid", $"rank")
    })
  )

  val oracles: Map[String, String] = Map(
    "sim_topk_brute" ->
      """SELECT qid, nid, round(cos, 4) AS cos, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT q.vec_id AS qid, c.vec_id AS nid,
        |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                           CAST(c.embedding AS DOUBLE[])) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                      CAST(c.embedding AS DOUBLE[])) DESC,
        |               c.vec_id ASC) AS rank
        |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10)
        |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    "sim_join" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin,

    "sim_topk_lsh" -> VectorOracles.lshTopKSql(k = 10, dim = EmbDim,
      nPlanes = 4, nTables = 16, maxQid = 10),

    "sim_recall_at_k" -> {
      val brute =
        """SELECT qid, nid FROM (
          |  SELECT q.vec_id AS qid, c.vec_id AS nid,
          |    row_number() OVER (PARTITION BY q.vec_id
          |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
          |                                      CAST(c.embedding AS DOUBLE[])) DESC,
          |               c.vec_id ASC) AS rank
          |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
          |  WHERE q.vec_id < 10)
          |WHERE rank <= 10""".stripMargin
      val lsh = VectorOracles.lshTopKSql(k = 10, dim = EmbDim,
        nPlanes = 4, nTables = 16, maxQid = 10)
      s"""WITH brute AS ($brute),
         |lsh AS (SELECT qid, nid FROM ($lsh)),
         |hits AS (
         |  SELECT b.qid, count(l.nid) AS hits
         |  FROM brute b LEFT JOIN lsh l ON b.qid = l.qid AND b.nid = l.nid
         |  GROUP BY 1)
         |SELECT count(*) AS n_queries,
         |  round(avg(hits / 10.0), 4) AS recall_at_10
         |FROM hits""".stripMargin
    },

    "sim_topk_ivf" -> VectorOracles.ivfTopKSql(k = 10, nCells = 16,
      nprobe = 4, iters = 3, maxQid = 10)
  )
}
