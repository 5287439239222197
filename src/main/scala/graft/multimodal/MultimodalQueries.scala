package graft.multimodal

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.functions._

/** §2.8 — multimodal plumbing queries. Payloads are synthesized from
  * `documents.text` (deterministically), so the stub decode's outputs
  * are oracle-reproducible as byte-length arithmetic. */
object MultimodalQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    "mm_decode" -> ((s, d) => {
      import s.implicits._
      Multimodal.decodeFeatures(
          Multimodal.withFakePayload(T.documents(s, d), "doc_id", "text"))
        .select($"media_id", $"payload_len", $"width", $"height", $"n_frames")
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
    "mm_decode" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
        |  CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
        |  CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS height,
        |  CAST(octet_length(encode(text)) % 10 + 1 AS BIGINT) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin,

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
