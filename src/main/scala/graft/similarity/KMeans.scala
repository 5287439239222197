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
  def cellExpr(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct((-cosine(vec, typedlit(c))).as("negcos"), lit(i).as("cell"))
    }
    array_min(array(scored: _*)).getField("cell")
  }

  /** Per-query nearest `nprobe` cell ids, as an array column. */
  def probeExpr(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct((-cosine(vec, typedlit(c))).as("negcos"), lit(i).as("cell"))
    }
    transform(slice(array_sort(array(scored: _*)), 1, nprobe),
      s => s.getField("cell"))
  }

  /** Fit centroids; returns k vectors (driver-side k×dim only). */
  def fit(df: DataFrame, id: String, vec: String, k: Int,
      iters: Int = 5): Seq[Seq[Double]] = {
    val base = graft.Util.ensureParallelism(df.select(col(id).as("__id"),
      transform(col(vec), _.cast("double")).as("__v")))
    var centroids: Seq[Seq[Double]] = base.orderBy(col("__id")).limit(k)
      .select(col("__v")).collect().map(_.getSeq[Double](0).toSeq).toSeq
    for (_ <- 0 until iters) {
      val assigned = base.withColumn("__cell", cellExpr(col("__v"), centroids))
      val next = assigned
        .select(col("__cell"), posexplode(col("__v")).as(Seq("__dim", "__x")))
        .groupBy(col("__cell"), col("__dim"))
        .agg(avg(col("__x")).as("__m"))
        .groupBy(col("__cell"))
        .agg(array_sort(collect_list(struct(col("__dim"), col("__m")))).as("__s"))
        .select(col("__cell"),
          transform(col("__s"), s => s.getField("__m")).as("__c"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      // empty cells keep their previous centroid
      centroids = centroids.indices.map(i => next.getOrElse(i, centroids(i)))
    }
    centroids
  }
}
