package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate candidate generation.
  *
  * Signatures are computed row-local with higher-order functions
  * (`transform` + `array_min` over xxhash64(shingle, seed)) — zero
  * shuffle, stays inside codegen. Banding then shuffles ONE row per
  * (doc, band): 100 TB of text becomes `numBands` long-ints per doc
  * on the wire. Candidate pairs come from the band-bucket self-join;
  * exact Jaccard verification runs only inside buckets.
  *
  * Deterministic: seeds are the hash index, so the same corpus always
  * produces the same candidates (LSH here is a pruning, not a random
  * process — re-runs and oracle checks reproduce bit-for-bit).
  */
object MinHash {
  val NumHashes = 64
  val NumBands = 16
  val RowsPerBand: Int = NumHashes / NumBands

  /** MinHash signature as NumHashes long columns sig_0..sig_{H-1}. */
  def withSignature(df: DataFrame, shingleArr: Column): DataFrame = {
    val distinctSh = array_distinct(shingleArr)
    (0 until NumHashes).foldLeft(df) { (acc, i) =>
      acc.withColumn(s"sig_$i",
        array_min(transform(distinctSh, s => xxhash64(s, lit(i)))))
    }
  }

  /** (doc, band_idx, band_hash) rows; docs with no shingles drop out. */
  def bands(df: DataFrame, id: String, shingleArr: Column): DataFrame = {
    val sig = withSignature(df.select(col(id).as("__id"),
      shingleArr.as("__sh")), col("__sh"))
      .filter(size(col("__sh")) > 0)
    val bandCols = (0 until NumBands).map { b =>
      val slice = (0 until RowsPerBand).map(r => col(s"sig_${b * RowsPerBand + r}"))
      struct(lit(b).as("band_idx"), xxhash64(slice: _*).as("band_hash"))
    }
    sig.select(col("__id"), explode(array(bandCols: _*)).as("band"))
      .select(col("__id"), col("band.band_idx"), col("band.band_hash"))
  }

  /** Distinct candidate pairs (a_id < b_id) sharing ≥1 band bucket. */
  def candidatePairs(df: DataFrame, id: String, shingleArr: Column): DataFrame = {
    val b = bands(df, id, shingleArr)
    b.as("x").join(b.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a_id"), col("y.__id").as("b_id"))
      .distinct()
  }

  /** LSH candidates verified with exact Jaccard over the shingle sets
    * (verification joins only the candidate pairs — O(candidates),
    * not O(N²)). Output: (a_id, b_id, jaccard) ≥ threshold. */
  def nearDupPairs(df: DataFrame, id: String, shingleArr: Column,
      threshold: Double): DataFrame = {
    val sets = df.select(col(id).as("__sid"),
      array_distinct(shingleArr).as("__set"))
    candidatePairs(df, id, shingleArr)
      .join(sets.select(col("__sid").as("a_id"), col("__set").as("__sa")), "a_id")
      .join(sets.select(col("__sid").as("b_id"), col("__set").as("__sb")), "b_id")
      .withColumn("__i", size(array_intersect(col("__sa"), col("__sb"))).cast("double"))
      .withColumn("jaccard",
        col("__i") / (size(col("__sa")) + size(col("__sb")) - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }
}
