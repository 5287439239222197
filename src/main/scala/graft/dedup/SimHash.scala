package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 60-bit SimHash fingerprints + hamming-bucket candidate pairs.
  *
  * Relational formulation: explode distinct tokens, hash each token
  * ONCE, then 60 sum-aggregates of ±1 bit votes in a single grouped
  * pass (map-side partials — same shape as [[MinHash.signatures]]).
  * A per-row fold (`aggregate` over the token array × 60 bits) would
  * re-hash every token 60 times in interpreted lambdas.
  *
  * The token hash is the top 60 bits of md5 (15 hex chars → bigint
  * via `conv`) rather than xxhash64: md5 exists in every engine, so
  * the fingerprints — and therefore the candidate pairs — are
  * reproducible by the DuckDB oracle
  * (`('0x' || substr(md5(t),1,15))::BIGINT`). 60 bits keeps the
  * value positive in a signed 64-bit long on both sides.
  *
  * Candidates: split the fingerprint into 4×15-bit chunks; pairs
  * within hamming distance 3 must share ≥1 exact chunk (pigeonhole),
  * so the chunk self-join finds them with a linear shuffle.
  */
object SimHash {

  val Bits = 60

  /** Engine-agnostic 60-bit token hash (md5 prefix, zero-extended). */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** (__id, simhash) — one 60-bit fingerprint per document.
    *
    * The 60 per-bit vote counters are packed 4-per-long into 15
    * lanes of 16 bits (safe while a document has < 65 536 distinct
    * tokens): the aggregate buffer shrinks 60 → 16 columns, which
    * quarters the hash-agg update/merge cost. `±1 votes > 0` is
    * equivalently `2·ones > n`, so fingerprints are bit-identical
    * to the unpacked form. */
  def fingerprints(df: DataFrame, id: String, text: String): DataFrame = {
    val posts = graft.Util.ensureParallelism(df.select(col(id), col(text)))
      .select(col(id).as("__id"),
        explode(array_distinct(TextAnalysis.tokens(col(text)))).as("__t"))
      .select(col("__id"), tokenHash(col("__t")).as("__h"))
    val lanes = (0 until Bits / 4).map { j =>
      sum((0 until 4).map(k =>
        shiftright(col("__h"), 4 * j + k).bitwiseAND(1L) * lit(1L << (16 * k)))
        .reduce(_ + _)).as(s"lane_$j")
    }
    val aggs = count(lit(1)).as("__n") +: lanes
    posts.groupBy(col("__id")).agg(aggs.head, aggs.tail: _*)
      .select(col("__id"),
        (0 until Bits).map { b =>
          val (j, k) = (b / 4, b % 4)
          val ones = shiftright(col(s"lane_$j"), 16 * k).bitwiseAND(0xFFFFL)
          when(ones * 2 > col("__n"), lit(1L << b)).otherwise(0L)
        }.reduce(_ + _).as("simhash"))
  }

  /** (id, chunk_idx, chunk_value) — 4 rows/doc of 15-bit chunks. */
  def chunks(fp: DataFrame): DataFrame = {
    val chunkCols = (0 until 4).map(c => struct(lit(c).as("chunk_idx"),
      shiftright(col("simhash"), c * 15).bitwiseAND(0x7FFFL).as("chunk_value")))
    fp.select(col("__id"), col("simhash"),
        explode(array(chunkCols: _*)).as("c"))
      .select(col("__id"), col("simhash"), col("c.chunk_idx"), col("c.chunk_value"))
  }

  /** Candidate pairs within `maxHamming` (≤ 3 guaranteed complete). */
  def nearPairs(df: DataFrame, id: String, text: String,
      maxHamming: Int = 3): DataFrame = {
    // checkpoint before the self-join: both join sides would otherwise
    // re-derive the whole tokenize+aggregate pipeline; the chunk table
    // is 4 small rows per doc
    val ch = chunks(fingerprints(df, id, text)).localCheckpoint()
    ch.as("x").join(ch.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx") &&
        col("x.chunk_value") === col("y.chunk_value") &&
        col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a_id"), col("y.__id").as("b_id"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      // filter BEFORE the dedup exchange (§2.3): hamming is a pure
      // function of the pair, so filter∘distinct ≡ distinct∘filter —
      // but filtering first shuffles only the ≤ maxHamming survivors,
      // not every random 15-bit chunk collision (at corpus scale the
      // collision set dwarfs the near-pair set)
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
