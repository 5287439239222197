package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 64-bit SimHash fingerprints + hamming-bucket candidate pairs.
  *
  * Per-token xxhash64 votes on each of 64 bit positions; the
  * fingerprint takes the sign of each vote sum. Computed row-local
  * via aggregate() over the token array — no explode, no shuffle.
  * Candidates: split the fingerprint into 4×16-bit chunks; pairs
  * within hamming distance 3 must share ≥1 exact chunk (pigeonhole),
  * so the chunk self-join finds them with a linear shuffle.
  */
object SimHash {

  /** Sum of per-token ±1 votes for bit `b`, folded over the array. */
  private def bitVote(toks: Column, b: Int): Column =
    aggregate(toks, lit(0L), (acc, t) =>
      acc + when(shiftright(xxhash64(t), b).bitwiseAND(1L) === 1L, 1L)
        .otherwise(-1L))

  /** 64-bit SimHash of a (distinct) token array column. */
  def simhash(toks: Column): Column = {
    val d = array_distinct(toks)
    (0 until 64).map(b =>
      when(bitVote(d, b) > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
  }

  /** (id, chunk_idx, chunk_value) — 4 rows/doc of 16-bit chunks. */
  def chunks(df: DataFrame, id: String, sh: Column): DataFrame = {
    val base = df.select(col(id).as("__id"), sh.as("__sh"))
    val chunkCols = (0 until 4).map(c => struct(lit(c).as("chunk_idx"),
      shiftright(col("__sh"), c * 16).bitwiseAND(0xFFFFL).as("chunk_value")))
    base.select(col("__id"), col("__sh"), explode(array(chunkCols: _*)).as("c"))
      .select(col("__id"), col("__sh"), col("c.chunk_idx"), col("c.chunk_value"))
  }

  /** Candidate pairs within `maxHamming` (≤ 3 guaranteed complete). */
  def nearPairs(df: DataFrame, id: String, toks: Column,
      maxHamming: Int = 3): DataFrame = {
    val ch = chunks(df.withColumn("__simhash", simhash(toks)), id,
      col("__simhash"))
    ch.as("x").join(ch.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx") &&
        col("x.chunk_value") === col("y.chunk_value") &&
        col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a_id"), col("y.__id").as("b_id"),
        bit_count(col("x.__sh").bitwiseXOR(col("y.__sh"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
