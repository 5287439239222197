package graft.similarity

/** DuckDB replays of the deterministic vector algorithms.
  *
  * Everything here is generated from the SAME Scala code that builds
  * the Spark plans ([[Similarity.planeSigns]], fixed Lloyd's
  * iteration counts), so the oracle executes the identical algorithm
  * — not an approximation of it — and results hash-match exactly.
  */
object VectorOracles {

  /** CTE chain `c0 … c$iters(cell, c)` — [[KMeans.fit]] (init = k
    * smallest ids, max-cosine assignment with ties to the lower
    * cell, arithmetic-mean update, empty cells keep their centroid)
    * unrolled in SQL. Expects a CTE `emb(vec_id, v DOUBLE[])` in
    * scope.
    *
    * Training runs over `ktr`, the `maxTrain` smallest-id rows —
    * the SAME bounded deterministic sample [[KMeans.fit]] collects —
    * so the replay stays exact at ANY corpus size, not just when the
    * corpus happens to fit the sample (the round-2 latent mismatch:
    * an unguarded full-corpus oracle silently diverges beyond
    * `maxTrain` rows). */
  def kmeansCtes(k: Int, iters: Int, maxTrain: Int = 10000): String = {
    val init =
      s"""ktr AS (
         |  SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT $maxTrain),
         |c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
         |    v AS c
         |  FROM (SELECT vec_id, v FROM ktr ORDER BY vec_id LIMIT $k))"""
        .stripMargin
    val steps = (1 to iters).flatMap { i =>
      Seq(
        s"""a$i AS (
           |  SELECT vec_id, v, cell FROM (
           |    SELECT e.vec_id, e.v, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.cell) AS rn
           |    FROM ktr e CROSS JOIN c${i - 1} c) WHERE rn = 1)""".stripMargin,
        s"""u$i AS (
           |  SELECT cell, list(m ORDER BY i) AS c FROM (
           |    SELECT cell, i, avg(x) AS m FROM (
           |      SELECT cell, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS i
           |      FROM a$i) GROUP BY cell, i) GROUP BY cell)""".stripMargin,
        s"""c$i AS (
           |  SELECT p.cell, coalesce(u.c, p.c) AS c
           |  FROM c${i - 1} p LEFT JOIN u$i u ON p.cell = u.cell)""".stripMargin)
    }
    (init +: steps).mkString(",\n")
  }

  private def signList(table: Int, plane: Int, dim: Int): String =
    Similarity.planeSigns(table, plane, dim)
      .map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  /** nPlanes-bit LSH bucket expression over a DOUBLE[] column `v`,
    * one literal hyperplane per plane — same literals as the Spark
    * plan. */
  private def bucketExpr(table: Int, nPlanes: Int, dim: Int): String =
    (0 until nPlanes).map { p =>
      s"(CASE WHEN list_dot_product(v, ${signList(table, p, dim)}) > 0 " +
        s"THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** Full sim_topk_lsh replay: postings for all L tables, bucket
    * join, exact cosine re-rank, top-k. */
  def lshTopKSql(k: Int, dim: Int, nPlanes: Int, nTables: Int,
      maxQid: Int): String = {
    val postings = (0 until nTables).map { t =>
      s"SELECT vec_id, v, $t AS tbl, ${bucketExpr(t, nPlanes, dim)} AS bkt FROM emb"
    }.mkString("\n  UNION ALL ")
    s"""WITH emb AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cb AS (
       |  $postings),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
       |  FROM cb c JOIN cb q ON c.tbl = q.tbl AND c.bkt = q.bkt
       |    AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $maxQid),
       |ranked AS (
       |  SELECT qid, nid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM (
       |    SELECT cand.qid, cand.nid,
       |      list_cosine_similarity(eq.v, ec.v) AS cos
       |    FROM cand
       |    JOIN emb eq ON eq.vec_id = cand.qid
       |    JOIN emb ec ON ec.vec_id = cand.nid))
       |SELECT qid, nid, round(cos, 4) AS cos, CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** Full sim_topk_ivf replay: Lloyd's quantizer, one-cell corpus
    * assignment, nprobe-cell query routing, exact cosine re-rank. */
  def ivfTopKSql(k: Int, nCells: Int, nprobe: Int, iters: Int,
      maxQid: Int): String = {
    s"""WITH emb AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${kmeansCtes(nCells, iters)},
       |assign AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT e.vec_id, e.v, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.cell) AS rn
       |    FROM emb e CROSS JOIN c$iters c) WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS qid, v AS qv, cell FROM (
       |    SELECT e.vec_id, e.v, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.cell) AS rn
       |    FROM emb e CROSS JOIN c$iters c
       |    WHERE e.vec_id < $maxQid) WHERE rn <= $nprobe),
       |ranked AS (
       |  SELECT qid, nid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM (
       |    SELECT p.qid, a.vec_id AS nid,
       |      list_cosine_similarity(p.qv, a.v) AS cos
       |    FROM assign a JOIN probes p
       |      ON a.cell = p.cell AND a.vec_id <> p.qid))
       |SELECT qid, nid, round(cos, 4) AS cos, CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** ml_kmeans replay: final-centroid assignment report. */
  def kmeansReportSql(k: Int, iters: Int): String =
    s"""WITH emb AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${kmeansCtes(k, iters)},
       |final AS (
       |  SELECT vec_id, cell, cos FROM (
       |    SELECT e.vec_id, c.cell,
       |      list_cosine_similarity(e.v, c.c) AS cos,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.cell) AS rn
       |    FROM emb e CROSS JOIN c$iters c) WHERE rn = 1)
       |SELECT cell, count(*) AS n, round(avg(cos), 4) AS avg_cos
       |FROM final GROUP BY cell ORDER BY cell""".stripMargin
}
