package graft.multimodal

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._

/** §2.8 — multimodal queries. `mm_decode` round-trips a REAL binary
  * raster format: each document gets a deterministic P6 PPM payload
  * whose parsed dimensions and channel means are closed-form in the
  * id, so the oracle replays them with generate_series arithmetic
  * while the Spark side genuinely parses file bytes. `mm_frames`
  * stays on the stub codec (video plumbing only). */
object MultimodalQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    "mm_decode" -> ((s, d) => {
      import s.implicits._
      Multimodal.decodePpm(
          Multimodal.withPpmPayload(T.documents(s, d), "doc_id"))
        .select($"media_id", $"width", $"height", $"n_px",
          r4($"sum_r" / $"n_px".cast("double")).as("mean_r"),
          r4($"sum_g" / $"n_px".cast("double")).as("mean_g"),
          r4($"sum_b" / $"n_px".cast("double")).as("mean_b"))
        .orderBy($"media_id")
    }),

    "mm_frames" -> ((s, d) => {
      import s.implicits._
      Multimodal.sampleFrames(
          Multimodal.decodeFeatures(
            Multimodal.withFakePayload(T.documents(s, d), "doc_id", "text")))
        .orderBy($"media_id", $"frame_idx")
    })
  )

  val oracles: Map[String, String] = Map(
    // The renderer's fields are closed-form in doc_id: pixel byte j is
    // (doc_id%256 + j) % 256, channel c of pixel k is byte 3k+c — the
    // oracle re-derives the channel sums the Spark side obtains by
    // actually parsing the P6 bytes.
    "mm_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 64 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 48 + 6 AS BIGINT) AS h,
        |    doc_id % 256 AS s
        |  FROM documents),
        |px AS (
        |  SELECT media_id, w, h,
        |    sum((s + 3*k) % 256) AS sr,
        |    sum((s + 3*k + 1) % 256) AS sg,
        |    sum((s + 3*k + 2) % 256) AS sb
        |  FROM m, LATERAL unnest(generate_series(0, w*h - 1)) AS t(k)
        |  GROUP BY 1, 2, 3)
        |SELECT media_id, w AS width, h AS height, w*h AS n_px,
        |  round(sr / CAST(w*h AS DOUBLE), 4) AS mean_r,
        |  round(sg / CAST(w*h AS DOUBLE), 4) AS mean_g,
        |  round(sb / CAST(w*h AS DOUBLE), 4) AS mean_b
        |FROM px ORDER BY media_id""".stripMargin,

    "mm_frames" ->
      """SELECT media_id, frame_idx,
        |  CAST(frame_idx * (payload_len // n_frames) AS BIGINT) AS frame_offset
        |FROM (
        |  SELECT doc_id AS media_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
        |    CAST(octet_length(encode(text)) % 10 + 1 AS BIGINT) AS n_frames,
        |    unnest(generate_series(0, octet_length(encode(text)) % 10)) AS frame_idx
        |  FROM documents)
        |ORDER BY media_id, frame_idx""".stripMargin
  )
}
