package graft.multimodal

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._

/** §2.8 — multimodal queries. Each key round-trips a REAL binary
  * container format — `mm_decode` P6 PPM rasters, `mm_audio`
  * RIFF/WAVE PCM16, `mm_decode_video`/`mm_frames` RIFF/AVI with
  * uncompressed DIB frames — rendered deterministically per document
  * so every parsed statistic is closed-form in the id: the oracle
  * replays them with generate_series arithmetic while the Spark side
  * genuinely walks file bytes. */
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

    "mm_decode_video" -> ((s, d) => {
      import s.implicits._
      Multimodal.decodeAvi(
          Multimodal.withAviPayload(T.documents(s, d), "doc_id"))
        .select($"media_id", $"width", $"height", $"n_frames",
          posexplode($"frame_sums").as(Seq("frame_idx", "frame_sum")))
        .select($"media_id", $"width", $"height", $"n_frames",
          $"frame_idx".cast("long").as("frame_idx"), $"frame_sum")
        .orderBy($"media_id", $"frame_idx")
    }),

    "mm_frames" -> ((s, d) => {
      import s.implicits._
      Multimodal.sampleFrames(
          Multimodal.decodeAvi(
            Multimodal.withAviPayload(T.documents(s, d), "doc_id")))
        .orderBy($"media_id", $"frame_idx")
    }),

    // Perceptual image hash per document: REAL decode (P6 byte walk)
    // -> 8x8 nearest-neighbor grayscale grid -> 56-bit dHash. The
    // oracle recomputes every bit closed-form from the renderer's
    // pixel formula, so a single wrong comparison anywhere in the
    // grid flips a hash and fails the gate.
    "mm_phash" -> ((s, d) => {
      import s.implicits._
      Multimodal.phashPpm(
          Multimodal.withPpmPayload(T.documents(s, d), "doc_id"))
        .select($"media_id", $"phash")
        .orderBy($"media_id")
    }),

    // Image dedup, stage 1 of the image arm: group by perceptual hash
    // (hamming-0 clusters), keep the smallest id per cluster — a
    // linear hash-groupBy at any corpus size. The HAMMING-RADIUS
    // stage is deliberately not keyed on this corpus: the synthetic
    // rasters are one wrapping gradient, and 46% of ALL pairs sit
    // within 6 bits (measured at sf0.01) — a radius join here would
    // gate a quadratic degenerate case, not the operator. Radius
    // banding is dedup_simhash's machinery verbatim (7-bit chunks of
    // the same 56-bit key).
    "dedup_image" -> ((s, d) => {
      import s.implicits._
      Multimodal.phashPpm(
          Multimodal.withPpmPayload(T.documents(s, d), "doc_id"))
        .groupBy($"phash")
        .agg(count(lit(1)).as("n_copies"), min($"media_id").as("keeper"))
        .filter($"n_copies" >= 2)
        .orderBy(desc("n_copies"), $"phash")
        .limit(20)
    }),

    // Audio fingerprint per document: REAL decode (RIFF chunk walk)
    // -> 57 equal time windows of left-channel energy -> 56-bit
    // adjacent-window comparison fingerprint. Oracle re-derives every
    // bit closed-form from the renderer's sample formula.
    "mm_afp" -> ((s, d) => {
      import s.implicits._
      Multimodal.afpWav(
          Multimodal.withWavPayload(T.documents(s, d), "doc_id"))
        .select($"media_id", $"afp")
        .orderBy($"media_id")
    }),

    // Audio dedup, stage 1 of the audio arm: fingerprint-equality
    // clusters (hash-groupBy, keep the smallest id) — the same linear
    // shape and rationale as dedup_image; hamming-radius banding is
    // dedup_simhash's machinery verbatim over the same 56-bit key.
    "dedup_audio" -> ((s, d) => {
      import s.implicits._
      Multimodal.afpWav(
          Multimodal.withWavPayload(T.documents(s, d), "doc_id"))
        .groupBy($"afp")
        .agg(count(lit(1)).as("n_copies"), min($"media_id").as("keeper"))
        .filter($"n_copies" >= 2)
        .orderBy(desc("n_copies"), $"afp")
        .limit(20)
    }),

    // Video fingerprint per document: REAL decode (RIFF/AVI chunk
    // walk) -> first ≤8 frames × 8 intra-frame energy windows ->
    // 56-bit adjacent-window comparison fingerprint. Oracle
    // re-derives every bit closed-form from the renderer's pixel
    // formula — one wrong window boundary or comparison flips a bit.
    "mm_vhash" -> ((s, d) => {
      import s.implicits._
      Multimodal.vhashAvi(
          Multimodal.withAviPayload(T.documents(s, d), "doc_id"))
        .select($"media_id", $"vhash")
        .orderBy($"media_id")
    }),

    // Video dedup, stage 1 of the video arm: fingerprint-equality
    // clusters (hash-groupBy, keep the smallest id) — the same linear
    // shape as dedup_image/dedup_audio, completing the multimodal
    // dedup triple; hamming-radius banding is dedup_simhash's
    // machinery verbatim over the same 56-bit key.
    "dedup_video" -> ((s, d) => {
      import s.implicits._
      Multimodal.vhashAvi(
          Multimodal.withAviPayload(T.documents(s, d), "doc_id"))
        .groupBy($"vhash")
        .agg(count(lit(1)).as("n_copies"), min($"media_id").as("keeper"))
        .filter($"n_copies" >= 2)
        .orderBy(desc("n_copies"), $"vhash")
        .limit(20)
    }),

    "mm_audio" -> ((s, d) => {
      import s.implicits._
      Multimodal.decodeWav(
          Multimodal.withWavPayload(T.documents(s, d), "doc_id"))
        .select($"media_id", $"n_ch", $"sample_rate", $"n_samples",
          r4($"sum_l" / $"n_samples".cast("double")).as("mean_l"),
          r4($"sum_r" / $"n_samples".cast("double")).as("mean_r"),
          $"peak")
        .orderBy($"media_id")
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

    // every dHash bit re-derived closed-form: grayscale g(x,y) is the
    // channel sum of the nearest-neighbor sample (y*h/8 row, x*w/8
    // col) of the (s+j)%256 gradient; bit (x,y) = g(x+1,y) > g(x,y)
    // packed at y*7+x
    "mm_phash" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 64 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 48 + 6 AS BIGINT) AS h,
        |    doc_id % 256 AS s
        |  FROM documents),
        |grid AS (
        |  SELECT media_id, x, y,
        |    ((s + 3*((y*h//8)*w + (x*w//8))) % 256
        |     + (s + 3*((y*h//8)*w + (x*w//8)) + 1) % 256
        |     + (s + 3*((y*h//8)*w + (x*w//8)) + 2) % 256) AS g
        |  FROM m, LATERAL unnest(generate_series(0, 7)) AS tx(x),
        |       LATERAL unnest(generate_series(0, 7)) AS ty(y))
        |SELECT a.media_id,
        |  CAST(sum(CASE WHEN b.g > a.g
        |    THEN 1::BIGINT << (a.y*7 + a.x) ELSE 0 END) AS BIGINT)
        |    AS phash
        |FROM grid a JOIN grid b
        |  ON a.media_id = b.media_id AND a.y = b.y AND b.x = a.x + 1
        |WHERE a.x < 7
        |GROUP BY a.media_id ORDER BY a.media_id""".stripMargin,

    "dedup_image" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 64 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 48 + 6 AS BIGINT) AS h,
        |    doc_id % 256 AS s
        |  FROM documents),
        |grid AS (
        |  SELECT media_id, x, y,
        |    ((s + 3*((y*h//8)*w + (x*w//8))) % 256
        |     + (s + 3*((y*h//8)*w + (x*w//8)) + 1) % 256
        |     + (s + 3*((y*h//8)*w + (x*w//8)) + 2) % 256) AS g
        |  FROM m, LATERAL unnest(generate_series(0, 7)) AS tx(x),
        |       LATERAL unnest(generate_series(0, 7)) AS ty(y)),
        |ph AS (
        |  SELECT a.media_id,
        |    CAST(sum(CASE WHEN b.g > a.g
        |      THEN 1::BIGINT << (a.y*7 + a.x) ELSE 0 END) AS BIGINT)
        |      AS phash
        |  FROM grid a JOIN grid b
        |    ON a.media_id = b.media_id AND a.y = b.y AND b.x = a.x + 1
        |  WHERE a.x < 7
        |  GROUP BY a.media_id)
        |SELECT phash, count(*) AS n_copies, min(media_id) AS keeper
        |FROM ph GROUP BY phash HAVING count(*) >= 2
        |ORDER BY n_copies DESC, phash LIMIT 20""".stripMargin,

    // every fingerprint bit re-derived closed-form: left-channel
    // sample k is (id*7 + 13k) % 4096 - 2048 over n = id%384+64
    // frames; window w = k*57/n, bit w = energy(w+1) > energy(w)
    "mm_afp" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 384 + 64 AS BIGINT) AS n
        |  FROM documents),
        |en AS (
        |  SELECT media_id, (k*57)//n AS w,
        |    sum(((media_id*7 + 13*k) % 4096 - 2048)
        |      * ((media_id*7 + 13*k) % 4096 - 2048)) AS e
        |  FROM m, LATERAL unnest(generate_series(0, n - 1)) AS t(k)
        |  GROUP BY 1, 2)
        |SELECT a.media_id,
        |  CAST(sum(CASE WHEN b.e > a.e
        |    THEN 1::BIGINT << CAST(a.w AS INT) ELSE 0 END) AS BIGINT)
        |    AS afp
        |FROM en a JOIN en b
        |  ON a.media_id = b.media_id AND b.w = a.w + 1
        |WHERE a.w < 56
        |GROUP BY a.media_id ORDER BY a.media_id""".stripMargin,

    "dedup_audio" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 384 + 64 AS BIGINT) AS n
        |  FROM documents),
        |en AS (
        |  SELECT media_id, (k*57)//n AS w,
        |    sum(((media_id*7 + 13*k) % 4096 - 2048)
        |      * ((media_id*7 + 13*k) % 4096 - 2048)) AS e
        |  FROM m, LATERAL unnest(generate_series(0, n - 1)) AS t(k)
        |  GROUP BY 1, 2),
        |fp AS (
        |  SELECT a.media_id,
        |    CAST(sum(CASE WHEN b.e > a.e
        |      THEN 1::BIGINT << CAST(a.w AS INT) ELSE 0 END) AS BIGINT)
        |      AS afp
        |  FROM en a JOIN en b
        |    ON a.media_id = b.media_id AND b.w = a.w + 1
        |  WHERE a.w < 56
        |  GROUP BY a.media_id)
        |SELECT afp, count(*) AS n_copies, min(media_id) AS keeper
        |FROM fp GROUP BY afp HAVING count(*) >= 2
        |ORDER BY n_copies DESC, afp LIMIT 20""".stripMargin,

    // every fingerprint bit re-derived closed-form: byte j of frame f
    // is (id + 31f + j) % 256 over fsz = w·h·3 bytes; window
    // x = (j·8)//fsz, bit f·7+x = winsum(f, x+1) > winsum(f, x).
    // n = id%6+2 ≤ 7, so the codec's min(n, 8) frame cap never binds
    // on these payloads and the replay uses n directly.
    "mm_vhash" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(4*(doc_id % 8 + 2) AS BIGINT) AS w,
        |    CAST(doc_id % 8 + 3 AS BIGINT) AS h,
        |    CAST(doc_id % 6 + 2 AS BIGINT) AS n
        |  FROM documents),
        |fr AS (
        |  SELECT media_id, w, h, f
        |  FROM m, LATERAL unnest(generate_series(0, n - 1)) AS t(f)),
        |win AS (
        |  SELECT media_id, f, (j*8)//(w*h*3) AS x,
        |    sum((media_id + 31*f + j) % 256) AS e
        |  FROM fr, LATERAL unnest(generate_series(0, w*h*3 - 1)) AS t2(j)
        |  GROUP BY 1, 2, 3)
        |SELECT a.media_id,
        |  CAST(sum(CASE WHEN b.e > a.e
        |    THEN 1::BIGINT << CAST(a.f*7 + a.x AS INT) ELSE 0 END)
        |    AS BIGINT) AS vhash
        |FROM win a JOIN win b
        |  ON a.media_id = b.media_id AND a.f = b.f AND b.x = a.x + 1
        |WHERE a.x < 7
        |GROUP BY a.media_id ORDER BY a.media_id""".stripMargin,

    "dedup_video" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(4*(doc_id % 8 + 2) AS BIGINT) AS w,
        |    CAST(doc_id % 8 + 3 AS BIGINT) AS h,
        |    CAST(doc_id % 6 + 2 AS BIGINT) AS n
        |  FROM documents),
        |fr AS (
        |  SELECT media_id, w, h, f
        |  FROM m, LATERAL unnest(generate_series(0, n - 1)) AS t(f)),
        |win AS (
        |  SELECT media_id, f, (j*8)//(w*h*3) AS x,
        |    sum((media_id + 31*f + j) % 256) AS e
        |  FROM fr, LATERAL unnest(generate_series(0, w*h*3 - 1)) AS t2(j)
        |  GROUP BY 1, 2, 3),
        |vh AS (
        |  SELECT a.media_id,
        |    CAST(sum(CASE WHEN b.e > a.e
        |      THEN 1::BIGINT << CAST(a.f*7 + a.x AS INT) ELSE 0 END)
        |      AS BIGINT) AS vhash
        |  FROM win a JOIN win b
        |    ON a.media_id = b.media_id AND a.f = b.f AND b.x = a.x + 1
        |  WHERE a.x < 7
        |  GROUP BY a.media_id)
        |SELECT vhash, count(*) AS n_copies, min(media_id) AS keeper
        |FROM vh GROUP BY vhash HAVING count(*) >= 2
        |ORDER BY n_copies DESC, vhash LIMIT 20""".stripMargin,

    // The WAV renderer's samples are closed-form in doc_id: channel c
    // sample k is (id·7 + 13k + 5c) % 4096 − 2048 over
    // n = id % 384 + 64 frames — the oracle re-derives the channel
    // means and global peak the Spark side obtains by walking actual
    // RIFF/PCM16 bytes.
    "mm_audio" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 384 + 64 AS BIGINT) AS n
        |  FROM documents),
        |sm AS (
        |  SELECT media_id, n,
        |    sum((media_id*7 + 13*k) % 4096 - 2048) AS sl,
        |    sum((media_id*7 + 13*k + 5) % 4096 - 2048) AS sr_,
        |    max(greatest(abs((media_id*7 + 13*k) % 4096 - 2048),
        |                 abs((media_id*7 + 13*k + 5) % 4096 - 2048))) AS peak
        |  FROM m, LATERAL unnest(generate_series(0, n - 1)) AS t(k)
        |  GROUP BY 1, 2)
        |SELECT media_id, CAST(2 AS BIGINT) AS n_ch,
        |  CAST(8000 AS BIGINT) AS sample_rate, n AS n_samples,
        |  round(sl / CAST(n AS DOUBLE), 4) AS mean_l,
        |  round(sr_ / CAST(n AS DOUBLE), 4) AS mean_r,
        |  CAST(peak AS BIGINT) AS peak
        |FROM sm ORDER BY media_id""".stripMargin,

    // The AVI renderer's layout is fixed: headers end at byte 224,
    // frame f's chunk is "00db"(8) + w·h·3 data — so the PARSED
    // frame offsets the Spark side recovers from the chunk walk are
    // closed-form 232 + f·(w·h·3 + 8), and pixel byte j of frame f
    // is (id + 31f + j) mod 256 for the per-frame sums.
    "mm_decode_video" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(4*(doc_id % 8 + 2) AS BIGINT) AS w,
        |    CAST(doc_id % 8 + 3 AS BIGINT) AS h,
        |    CAST(doc_id % 6 + 2 AS BIGINT) AS n
        |  FROM documents),
        |fr AS (
        |  SELECT media_id, w, h, n, f
        |  FROM m, LATERAL unnest(generate_series(0, n - 1)) AS t(f)),
        |s AS (
        |  SELECT media_id, w, h, n, f,
        |    sum((media_id + 31*f + j) % 256) AS fsum
        |  FROM fr, LATERAL unnest(generate_series(0, w*h*3 - 1)) AS t2(j)
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT media_id, w AS width, h AS height, n AS n_frames,
        |  f AS frame_idx, CAST(fsum AS BIGINT) AS frame_sum
        |FROM s ORDER BY media_id, frame_idx""".stripMargin,

    "mm_frames" ->
      """SELECT media_id, f AS frame_idx,
        |  CAST(232 + f * (w*h*3 + 8) AS BIGINT) AS frame_offset
        |FROM (
        |  SELECT doc_id AS media_id,
        |    CAST(4*(doc_id % 8 + 2) AS BIGINT) AS w,
        |    CAST(doc_id % 8 + 3 AS BIGINT) AS h,
        |    CAST(doc_id % 6 + 2 AS BIGINT) AS n
        |  FROM documents),
        |  LATERAL unnest(generate_series(0, n - 1)) AS t(f)
        |ORDER BY media_id, frame_idx""".stripMargin
  )
}
