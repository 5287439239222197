package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: opaque binary payloads + typed
  * metadata, with batched decode/feature-extract plumbing.
  *
  * The container has no image/audio codecs, so [[StubCodec]] is a
  * clearly-marked DETERMINISTIC FAKE (arithmetic on payload bytes).
  * Everything around it — the binary column schema, the batched
  * mapPartitions signature, partition sizing, frame explosion — is
  * the real plumbing a codec would drop into.
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

  /** STUB decode — ??? in production; deterministic arithmetic here.
    * Runs as batched mapPartitions over the binary column: the shape
    * (iterator-to-iterator, no per-row JVM churn, partition-sized
    * batches) is exactly what a JNI/FFI codec binding needs. */
  def decodeFeatures(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("payload_len", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("n_frames", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val len = if (payload == null) 0L else payload.length.toLong
        // STUB: real codec would parse headers; we derive dims from
        // the byte length so the oracle can reproduce them.
        Row.fromSeq(r.toSeq ++ Seq(len, len % 640 + 1, len % 480 + 1,
          len % 10 + 1))
      }
    }(enc)
  }

  /** Explode each media row into sampled "frames" (byte-range slices)
    * — the frame-sampling plumbing for video, minus the codec. */
  def sampleFrames(decoded: DataFrame): DataFrame =
    decoded
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1)))
      .withColumn("frame_offset",
        col("frame_idx") * (col("payload_len") / col("n_frames")).cast("long"))
      .select(col("media_id"), col("frame_idx"), col("frame_offset"))
}
