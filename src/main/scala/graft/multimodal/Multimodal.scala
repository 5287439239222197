package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: opaque binary payloads + typed
  * metadata, with batched decode/feature-extract plumbing.
  *
  * Every media path is a REAL byte-level codec: [[withPpmPayload]]/
  * [[decodePpm]] (P6 PPM raster), [[withWavPayload]]/[[decodeWav]]
  * (RIFF/WAVE PCM16), and [[withAviPayload]]/[[decodeAvi]] (RIFF/AVI
  * with uncompressed DIB frames) — each a render→parse pair whose
  * parsed statistics are closed-form in the id (SQL-oracle
  * replayable) while the bytes are genuine container files. All
  * decodes run in the same batched mapPartitions shape a JNI/FFI
  * codec binding needs.
  */
object Multimodal {

  /** Canonical multimodal schema fragment. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = true)))

  /** Attach a synthetic binary payload derived from a text column —
    * stands in for real image/audio bytes in tests. */
  def withFakePayload(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id).as("media_id"),
      encode(col(text), "UTF-8").as("payload"),
      lit("image/fake").as("media_type"))

  /** Deterministic P6 PPM payload: `width = id % 64 + 8`,
    * `height = id % 48 + 6`, pixel byte j = `(id % 256 + j) % 256` —
    * every field is closed-form in the id, so a SQL oracle replays the
    * parsed statistics without touching the bytes. The bytes
    * themselves are a REAL raster file (feeding one to any PPM viewer
    * works); generation runs batched per partition like any encoder
    * would. */
  def withPpmPayload(df: DataFrame, id: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("media_type", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(id)
    df.mapPartitions { rows =>
      rows.map { r =>
        val mid = r.getLong(idIdx)
        Row(mid, PpmCodec.render(mid), "image/x-portable-pixmap")
      }
    }(enc)
  }

  /** REAL image decode: parse the P6 header (magic, dimensions,
    * maxval) and fold per-channel pixel sums in one pass over the
    * packed RGB bytes. Unparseable payloads yield null features
    * instead of failing the batch — the quarantine-friendly contract.
    * Batched mapPartitions (iterator-to-iterator) so a native codec
    * binding could amortize per-batch setup. */
  def decodePpm(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "payload")
      ++ Seq(
        StructField("width", LongType),
        StructField("height", LongType),
        StructField("n_px", LongType),
        StructField("sum_r", LongType),
        StructField("sum_g", LongType),
        StructField("sum_b", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val keep = r.toSeq.zipWithIndex
          .collect { case (v, i) if i != payloadIdx => v }
        val parsed = PpmCodec.parse(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(keep ++ (parsed match {
          case Some((w, h, sr, sg, sb)) =>
            Seq(w.toLong, h.toLong, w.toLong * h, sr, sg, sb)
          case None => Seq(null, null, null, null, null, null)
        }))
      }
    }(enc)
  }

  /** Deterministic RIFF/WAVE PCM16 payload (see [[WavCodec.render]]):
    * every parsed statistic is closed-form in the id, the bytes are a
    * REAL playable WAV file. */
  def withWavPayload(df: DataFrame, id: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("media_type", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(id)
    df.mapPartitions { rows =>
      rows.map { r =>
        val mid = r.getLong(idIdx)
        Row(mid, WavCodec.render(mid), "audio/wav")
      }
    }(enc)
  }

  /** REAL audio decode: RIFF chunk walk, PCM16 validation, one pass
    * over the interleaved samples for per-channel sums and the global
    * peak. Unparseable payloads yield null features — same
    * quarantine-friendly contract and batched mapPartitions shape as
    * [[decodePpm]]. */
  def decodeWav(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "payload")
      ++ Seq(
        StructField("n_ch", LongType),
        StructField("sample_rate", LongType),
        StructField("n_samples", LongType),
        StructField("sum_l", LongType),
        StructField("sum_r", LongType),
        StructField("peak", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val keep = r.toSeq.zipWithIndex
          .collect { case (v, i) if i != payloadIdx => v }
        val parsed = WavCodec.parse(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(keep ++ (parsed match {
          case Some((nch, rate, frames, s0, s1, peak)) =>
            Seq(nch.toLong, rate.toLong, frames, s0, s1, peak)
          case None => Seq(null, null, null, null, null, null)
        }))
      }
    }(enc)
  }

  /** Deterministic RIFF/AVI payload (see [[AviCodec.render]]): a real
    * container — hdrl/avih/strh/strf headers plus a movi list of
    * uncompressed DIB frames — whose every parsed statistic is
    * closed-form in the id. */
  /** Perceptual image hash: decode the P6 payload and compute the
    * 56-bit dHash ([[PpmCodec.dhash56]]) — the image arm of the
    * dedup family. Same batched mapPartitions shape and
    * null-on-unparseable quarantine contract as [[decodePpm]]. */
  def phashPpm(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "payload")
      :+ StructField("phash", LongType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val keep = r.toSeq.zipWithIndex
          .collect { case (v, i) if i != payloadIdx => v }
        Row.fromSeq(keep :+
          PpmCodec.dhash56(r.getAs[Array[Byte]](payloadIdx)).orNull)
      }
    }(enc)
  }

  /** Audio fingerprint: decode the WAV payload and compute the 56-bit
    * energy-delta fingerprint ([[WavCodec.afp56]]) — the audio arm of
    * the dedup family, same batched shape and quarantine contract as
    * [[phashPpm]]. */
  def afpWav(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "payload")
      :+ StructField("afp", LongType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val keep = r.toSeq.zipWithIndex
          .collect { case (v, i) if i != payloadIdx => v }
        Row.fromSeq(keep :+
          WavCodec.afp56(r.getAs[Array[Byte]](payloadIdx)).orNull)
      }
    }(enc)
  }

  def withAviPayload(df: DataFrame, id: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("media_type", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(id)
    df.mapPartitions { rows =>
      rows.map { r =>
        val mid = r.getLong(idIdx)
        Row(mid, AviCodec.render(mid), "video/x-msvideo")
      }
    }(enc)
  }

  /** REAL video decode: RIFF/AVI chunk walk — avih dimensions, movi
    * frame chunks, per-frame byte sums and ABSOLUTE byte offsets from
    * the parser's own positions (nothing derived from payload
    * length). Unparseable payloads yield null features but keep
    * `payload_len` — same quarantine-friendly contract and batched
    * mapPartitions shape as [[decodePpm]]/[[decodeWav]], which is
    * exactly what a JNI/FFI codec binding needs. */
  def decodeAvi(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "payload")
      ++ Seq(
        StructField("payload_len", LongType),
        StructField("width", LongType),
        StructField("height", LongType),
        StructField("n_frames", LongType),
        StructField("frame_sums", ArrayType(LongType)),
        StructField("frame_offsets", ArrayType(LongType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val keep = r.toSeq.zipWithIndex
          .collect { case (v, i) if i != payloadIdx => v }
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val len = if (payload == null) 0L else payload.length.toLong
        Row.fromSeq(keep ++ (AviCodec.parse(payload) match {
          case Some((w, h, n, sums, offs)) =>
            Seq(len, w.toLong, h.toLong, n.toLong, sums.toSeq, offs.toSeq)
          case None => Seq(len, null, null, null, null, null)
        }))
      }
    }(enc)
  }

  /** Video fingerprint: decode the AVI payload and compute the 56-bit
    * spatio-temporal fingerprint ([[AviCodec.vhash56]]) — the video
    * arm of the dedup family, same batched shape and quarantine
    * contract as [[phashPpm]]/[[afpWav]]. */
  def vhashAvi(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "payload")
      :+ StructField("vhash", LongType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val keep = r.toSeq.zipWithIndex
          .collect { case (v, i) if i != payloadIdx => v }
        Row.fromSeq(keep :+
          AviCodec.vhash56(r.getAs[Array[Byte]](payloadIdx)).orNull)
      }
    }(enc)
  }

  /** Explode each decoded video into its frames at the PARSED byte
    * offsets — real positions from the container walk, usable to
    * slice the payload for a per-frame decode stage. */
  def sampleFrames(decoded: DataFrame): DataFrame =
    decoded
      .select(col("media_id"),
        posexplode(col("frame_offsets")).as(Seq("frame_idx", "frame_offset")))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_offset"))
}
