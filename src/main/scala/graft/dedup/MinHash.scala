package graft.dedup

import graft.functions.ShingleHashes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate candidate generation.
  *
  * The corpus is tokenized and shingle-hashed EXACTLY ONCE, by the
  * codegen'd [[graft.functions.ShingleHashes]] expression (one tight
  * loop per row, no intermediate token/shingle strings), and the
  * resulting per-doc 64-bit shingle-key sets are localCheckpointed so
  * signatures, band buckets, and Jaccard verification all read the
  * same materialized frame — the text is never re-tokenized.
  *
  * Signatures are mins over `xxhash64(shingle_key, seed)`: re-hashing
  * a FIXED 16-byte input per seed, not the shingle string, so the 64
  * hash family costs 64 short hashes per posting. Banding then
  * shuffles ONE row per (doc, band): 100 TB of text becomes
  * `numBands` long-ints per doc on the wire. Candidate pairs come
  * from the band-bucket self-join; exact Jaccard verification runs
  * only inside buckets, over the long-key sets (set sizes are
  * interchangeable with string-shingle sets — collision odds ~n²/2⁶⁵,
  * same argument as ShingleHashes' contamination use).
  *
  * Deterministic: seeds are the hash index, so the same corpus always
  * produces the same candidates (LSH here is a pruning, not a random
  * process — re-runs and oracle checks reproduce bit-for-bit).
  */
object MinHash {
  val NumHashes = 64
  val NumBands = 16
  val RowsPerBand: Int = NumHashes / NumBands

  /** Per-doc distinct shingle-key sets (__id, __set: array<long>),
    * materialized once. Docs with fewer than n tokens drop out (empty
    * shingle set ⇒ no signature, no pairs — same as the explode-side
    * drop in the string formulation). */
  def shingleSets(df: DataFrame, id: String, text: String,
      n: Int): DataFrame =
    graft.Util.ensureParallelism(
      df.select(col(id).as("__id"),
        array_distinct(ShingleHashes.of(col(text), n)).as("__set")))
      .filter(size(col("__set")) > 0)
      .localCheckpoint()

  /** MinHash signatures (__id, sig_0..sig_{H-1}) via key explode + H
    * min-aggregates in ONE grouped pass (map-side partial mins —
    * linear in total postings; min over a multiset equals min over
    * the set). */
  def signatures(sets: DataFrame): DataFrame = {
    val posts = sets.select(col("__id"), explode(col("__set")).as("__h"))
    val aggs = (0 until NumHashes).map(i =>
      min(xxhash64(col("__h"), lit(i))).as(s"sig_$i"))
    posts.groupBy(col("__id")).agg(aggs.head, aggs.tail: _*)
  }

  /** (doc, band_idx, band_hash) rows. */
  def bands(sets: DataFrame): DataFrame = {
    val sig = signatures(sets)
    val bandCols = (0 until NumBands).map { b =>
      val slice = (0 until RowsPerBand).map(r => col(s"sig_${b * RowsPerBand + r}"))
      struct(lit(b).as("band_idx"), xxhash64(slice: _*).as("band_hash"))
    }
    sig.select(col("__id"), explode(array(bandCols: _*)).as("band"))
      .select(col("__id"), col("band.band_idx"), col("band.band_hash"))
  }

  /** Distinct candidate pairs (a_id < b_id) sharing ≥1 band bucket. */
  def candidatePairs(df: DataFrame, id: String, text: String,
      shingleN: Int): DataFrame =
    candidatePairsOf(shingleSets(df, id, text, shingleN))

  private def candidatePairsOf(sets: DataFrame): DataFrame = {
    // localCheckpoint, not cache() — ContextCleaner frees the blocks
    // when the plan is dropped; a DF cache would pin them forever
    val b = bands(sets).localCheckpoint()
    b.as("x").join(b.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a_id"), col("y.__id").as("b_id"))
      .distinct()
  }

  /** LSH candidates verified with exact Jaccard over the shingle-key
    * sets (verification joins only the candidate pairs —
    * O(candidates), not O(N²)). Output: (a_id, b_id, jaccard) ≥
    * threshold. */
  def nearDupPairs(df: DataFrame, id: String, text: String,
      shingleN: Int, threshold: Double): DataFrame = {
    val sets = shingleSets(df, id, text, shingleN)
    candidatePairsOf(sets)
      .join(sets.select(col("__id").as("a_id"), col("__set").as("__sa")), "a_id")
      .join(sets.select(col("__id").as("b_id"), col("__set").as("__sb")), "b_id")
      .withColumn("__i", size(array_intersect(col("__sa"), col("__sb"))).cast("double"))
      .withColumn("jaccard",
        col("__i") / (size(col("__sa")) + size(col("__sb")) - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }
}
