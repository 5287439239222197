package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
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

  /** MinHash signatures (__id, sig_0..sig_{H-1}) via shingle explode +
    * H min-aggregates in ONE grouped pass.
    *
    * Why not per-row `transform`+`array_min` columns: Catalyst's
    * projection collapsing inlines the whole shingle pipeline into
    * each of the 64 signature expressions (64× recompute, codegen
    * method-size blowup → interpreted fallback; measured ~400×
    * slower). The explode form shuffles (id, shingle) once with
    * map-side partial min aggregation — linear in total postings.
    * min over a multiset equals min over the set, so no distinct
    * is needed before exploding. */
  def signatures(shingled: DataFrame): DataFrame = {
    val posts = shingled.select(col("__id"),
      explode(col("__shingles")).as("__s"))
    val aggs = (0 until NumHashes).map(i =>
      min(xxhash64(col("__s"), lit(i))).as(s"sig_$i"))
    posts.groupBy(col("__id")).agg(aggs.head, aggs.tail: _*)
  }

  /** (doc, band_idx, band_hash) rows; docs with no shingles drop out
    * at the explode. */
  def bands(shingled: DataFrame): DataFrame = {
    val sig = signatures(shingled)
    val bandCols = (0 until NumBands).map { b =>
      val slice = (0 until RowsPerBand).map(r => col(s"sig_${b * RowsPerBand + r}"))
      struct(lit(b).as("band_idx"), xxhash64(slice: _*).as("band_hash"))
    }
    sig.select(col("__id"), explode(array(bandCols: _*)).as("band"))
      .select(col("__id"), col("band.band_idx"), col("band.band_hash"))
  }

  /** Distinct candidate pairs (a_id < b_id) sharing ≥1 band bucket. */
  def candidatePairs(df: DataFrame, id: String, text: String,
      shingleN: Int): DataFrame = {
    // localCheckpoint, not cache() — ContextCleaner frees the blocks
    // when the plan is dropped; a DF cache would pin them forever
    val b = bands(TextAnalysis.shingleDocs(df, id, text, shingleN))
      .localCheckpoint()
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
  def nearDupPairs(df: DataFrame, id: String, text: String,
      shingleN: Int, threshold: Double): DataFrame = {
    // localCheckpoint: the shingle sets feed both sides of the verify
    // join, and the band frame feeds both sides of the candidate
    // self-join — without materializing, the whole tokenize+shingle
    // pipeline runs 4×. (Not cache(): see jaccardPairs.)
    val sets = TextAnalysis.shingleDocs(df, id, text, shingleN)
      .select(col("__id").as("__sid"),
        array_distinct(col("__shingles")).as("__set"))
      .localCheckpoint()
    candidatePairs(df, id, text, shingleN)
      .join(sets.select(col("__sid").as("a_id"), col("__set").as("__sa")), "a_id")
      .join(sets.select(col("__sid").as("b_id"), col("__set").as("__sb")), "b_id")
      .withColumn("__i", size(array_intersect(col("__sa"), col("__sb"))).cast("double"))
      .withColumn("jaccard",
        col("__i") / (size(col("__sa")) + size(col("__sb")) - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }
}
