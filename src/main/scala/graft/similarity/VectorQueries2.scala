package graft.similarity

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** kNN label-vote classification over the embedding corpus.
  *
  * The vote is a pure composition of existing distributed pieces:
  * brute-force top-k (the oracle-grade path; swap in IVF/LSH routing
  * for the 100 TB corpus), a (query, label) partial count, and a
  * deterministic argmax window. No per-query driver state — queries
  * are themselves a DataFrame side, so a million-query batch
  * classifies in one job.
  */
object VectorQueries2 extends QueryModule {

  val queries: Map[String, Q] = Map(
    // Per-vector int8 scalar quantization (the FAISS SQ8 layout):
    // dims map to 0..255 against the vector's own [min, max], and the
    // round-trip error is reported per vector. Pure higher-order
    // array expressions — codegen'd, no UDFs, no shuffle at all
    // (embarrassingly parallel over vector partitions).
    "sim_quantize" -> ((s, d) => {
      import s.implicits._
      val v = $"v"
      val emb = T.embeddings(s, d)
        .select($"vec_id", $"embedding".cast("array<double>").as(v.toString))
        .withColumn("mn", array_min(v))
        .withColumn("mx", array_max(v))
      val scale = ($"mx" - $"mn") / 255.0
      val deq = transform(v, x =>
        $"mn" + round((x - $"mn") / scale) * scale)
      emb
        .withColumn("mse",
          aggregate(zip_with(v, deq, (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, e) => acc + e) / size(v))
        .select($"vec_id", r4($"mn").as("mn"), r4($"mx").as("mx"),
          r4($"mse" * 1e6).as("mse_ppm"))
        .orderBy($"vec_id")
    }),

    // Maximum-inner-product top-k (recsys scoring: rank by raw dot,
    // not angle) through the norm-augmentation reduction — the
    // augmented-cosine ordering IS the dot ordering, so the cosine
    // ANN machinery serves MIPS at scale (SimilaritySpec pins the
    // augmented-LSH recall against this exact ranking). The oracle
    // ranks by DuckDB's list_dot_product directly: if the reduction,
    // the M² bound, or the tie-break ever diverged, the rankings
    // would disagree.
    "sim_mips" -> ((s, d) => {
      import s.implicits._
      val emb = T.embeddings(s, d)
      Similarity.mipsTopK(emb, emb.filter($"vec_id" < 8),
          "vec_id", "embedding", k = 10)
        .select($"qid", $"nid", r4($"dot").as("dot"),
          $"rank".cast("long").as("rank"))
        .orderBy($"qid", $"rank")
    }),

    "sim_knn" -> ((s, d) => {
      import s.implicits._
      val emb = T.embeddings(s, d)
      val queriesDf = emb.filter($"vec_id" < 20)
      val corpus = emb.filter($"vec_id" >= 20)
      val nn = Similarity.bruteTopK(corpus, queriesDf,
        "vec_id", "embedding", k = 10)
      val votes = nn
        .join(corpus.select($"vec_id".as("nid"), $"label"), "nid")
        .groupBy($"qid", $"label")
        .agg(count(lit(1)).as("votes"))
      val w = Window.partitionBy($"qid")
        .orderBy($"votes".desc, $"label".asc)
      votes.withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"qid", $"label".cast("long").as("pred_label"),
          $"votes")
        .orderBy($"qid")
    })
  )

  val oracles: Map[String, String] = Map(
    // ranked by the raw dot product directly — equals the Spark
    // side's augmented-cosine ranking only if the MIPS→cosine
    // reduction is order-preserving on the real data
    "sim_mips" ->
      """SELECT qid, nid, round(dot, 4) AS dot,
        |  CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT q.vec_id AS qid, c.vec_id AS nid,
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                     CAST(c.embedding AS DOUBLE[])) AS dot,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                                CAST(c.embedding AS DOUBLE[])) DESC,
        |               c.vec_id ASC) AS rank
        |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 8)
        |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    "sim_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx
        |  FROM e),
        |q AS (SELECT vec_id, mn, mx,
        |    list_sum(list_transform(v, x ->
        |      (x - (mn + round((x - mn) / ((mx - mn) / 255.0))
        |                 * ((mx - mn) / 255.0)))
        |      * (x - (mn + round((x - mn) / ((mx - mn) / 255.0))
        |                 * ((mx - mn) / 255.0))))) / len(v) AS mse
        |  FROM m)
        |SELECT vec_id, round(mn, 4) AS mn, round(mx, 4) AS mx,
        |  round(mse * 1e6, 4) AS mse_ppm
        |FROM q ORDER BY vec_id""".stripMargin,

    "sim_knn" ->
      """WITH q AS (SELECT * FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT * FROM embeddings WHERE vec_id >= 20),
        |nn AS (SELECT qid, nid FROM (
        |  SELECT q.vec_id AS qid, c.vec_id AS nid,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                CAST(c.embedding AS DOUBLE[])) DESC,
        |        c.vec_id) AS rk
        |  FROM q CROSS JOIN c)
        |  WHERE rk <= 10),
        |votes AS (SELECT nn.qid, c.label, count(*) AS votes
        |  FROM nn JOIN c ON c.vec_id = nn.nid GROUP BY 1, 2)
        |SELECT qid, CAST(label AS BIGINT) AS pred_label, votes FROM (
        |  SELECT qid, label, votes, row_number() OVER (
        |    PARTITION BY qid ORDER BY votes DESC, label ASC) AS rk
        |  FROM votes)
        |WHERE rk = 1 ORDER BY qid""".stripMargin
  )
}
