package graft.similarity

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import graft.functions.ArrayDot
import org.apache.spark.sql.functions._

/** Vector-column operators over the `embeddings` table: per-class
  * centroids (the building block of IVF training, nearest-centroid
  * classification, and cluster drift monitoring) and higher-order
  * array functions staying entirely inside codegen.
  */
object VectorQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    "q_embed_centroid" -> ((s, d) => {
      import s.implicits._
      // Per-label centroid by dimension: posexplode → partial avg.
      // The explode shuffles N·dim skinny rows with map-side combine,
      // so 100 TB of vectors reduce to labels×dim rows without any
      // executor ever holding a full class in memory.
      T.embeddings(s, d).select($"label", posexplode($"embedding"))
        .groupBy($"label", $"pos".cast("long").as("dim"))
        .agg(r4(avg($"col")).as("centroid"))
        .orderBy($"label", $"dim")
    }),

    "q_array_hof" -> ((s, d) => {
      import s.implicits._
      // Higher-order array functions without leaving codegen: L2 norm
      // via the custom ArrayDot expression (sequential double
      // accumulation — matches DuckDB list_sum on DOUBLE), positive-
      // dimension count via filter+size. Per-row work, zero shuffles
      // until the final label rollup.
      val dot = ArrayDot.dot _
      T.embeddings(s, d)
        .select($"label",
          sqrt(dot($"embedding", $"embedding")).as("norm"),
          size(filter($"embedding", x => x > lit(0f))).as("n_pos"))
        .groupBy($"label")
        .agg(r4(avg($"norm")).as("avg_norm"),
          r4(avg($"n_pos")).as("avg_pos"),
          count(lit(1)).as("n"))
        .orderBy($"label")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_embed_centroid" ->
      """WITH e AS (SELECT label, unnest(embedding) AS x,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings)
        |SELECT label, CAST(dim AS BIGINT) AS dim,
        |  round(avg(x), 4) AS centroid
        |FROM e GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,

    "q_array_hof" ->
      """WITH e AS (SELECT label,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS norm,
        |    len(list_filter(embedding, x -> x > 0)) AS n_pos
        |  FROM embeddings)
        |SELECT label, round(avg(norm), 4) AS avg_norm,
        |  round(avg(n_pos), 4) AS avg_pos, count(*) AS n
        |FROM e GROUP BY label ORDER BY label""".stripMargin
  )
}
