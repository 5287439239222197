package graft.similarity

import graft.Util.cosine
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an embedding column — the IVF
  * coarse quantizer.
  *
  * Initialization: the k rows with the smallest ids (deterministic,
  * no RNG). Each iteration: one broadcast-assign pass + one grouped
  * per-dimension average (posexplode → avg → reassemble). Only the
  * k×dim centroid matrix is ever collected to the driver — the
  * assignment stays distributed, so this scales to any corpus size
  * with k·iters scans.
  */
object KMeans {

  /** Argmin-centroid cell id via array_min over (negCos, idx) structs
    * — struct ordering compares fields left-to-right, so ties break
    * on the lower cell index deterministically. */
  def cellExpr(vec: Column, centroids: Seq[Seq[Double]]): Column =
    graft.functions.NearestCells.of(vec, centroids, 1).getItem(0)

  /** Per-query nearest `nprobe` cell ids, as an array column. Both
    * routing expressions go through the codegen'd
    * [[graft.functions.NearestCells]] — the struct-min-over-literals
    * formulation put k×dim literal doubles in the plan and dropped
    * the assignment stage to interpreted eval (see that scaladoc). */
  def probeExpr(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    graft.functions.NearestCells.of(vec, centroids, nprobe)

  /** The centroid vector for a cell-id column, as an array column
    * (literal k×dim lookup table — broadcast with the plan). */
  def centroidFor(cell: Column, centroids: Seq[Seq[Double]]): Column =
    element_at(array(centroids.map(typedlit(_)): _*), (cell + 1).cast("int"))

  /** Fit centroids on a bounded deterministic training sample —
    * standard coarse-quantizer practice (FAISS trains IVF on a few
    * hundred vectors per centroid, not the corpus): ONE distributed
    * top-`maxTrain`-by-id collect, then Lloyd's locally on the
    * (≤ maxTrain)×dim sample. Corpus ASSIGNMENT stays fully
    * distributed ([[cellExpr]]); only the k×dim matrix plus the
    * sample ever reach the driver, independent of corpus size. */
  def fit(df: DataFrame, id: String, vec: String, k: Int,
      iters: Int = 5, maxTrain: Int = 10000): Seq[Seq[Double]] = {
    // TakeOrdered top-k by id: deterministic, no global sort
    val train: Array[Array[Double]] = df
      .select(col(id).as("__id"), transform(col(vec), _.cast("double")).as("__v"))
      .orderBy(col("__id")).limit(maxTrain)
      .collect().map(_.getSeq[Double](1).toArray)
    require(train.length >= k, s"need ≥ $k vectors, got ${train.length}")
    val dim = train.head.length
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      var i = 0
      while (i < dim) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    // init = k smallest ids; nearest = max cosine, ties → lower cell
    // (identical rules to cellExpr's struct-min)
    var cents = train.take(k).map(_.clone)
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      for (v <- train) {
        var best = 0
        var bestCos = cos(v, cents(0))
        for (c <- 1 until k) {
          val s = cos(v, cents(c))
          if (s > bestCos) { best = c; bestCos = s }
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      // empty cells keep their previous centroid
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c)))
    }
    cents.map(_.toSeq).toSeq
  }
}
