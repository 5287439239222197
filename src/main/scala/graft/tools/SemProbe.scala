package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Util.cosine
import graft.similarity.KMeans

/** SemDeDup scaling probe: the operator's scale story is the paper's
  * operating point — k (cluster count) GROWS with the corpus so cells
  * stay constant-sized and the within-cell quadratic term stays
  * bounded. The oracle-gated `dedup_semdedup` fixes k=16 for
  * replayability, which makes its sf1 slope look quadratic (10.8× in
  * the round-12 table). This probe measures the SAME pipeline
  * (Lloyd's fit → assignment → within-cell pair pruning) at sf0.1 and
  * .scale/sf1 under BOTH configs:
  *
  *   fixed-k:  k=16 at both scales (the oracle config — cells grow
  *             10×, pair work grows ~100×/cell-count)
  *   scaled-k: k ∝ corpus (16 → 160 — the paper config; cells stay
  *             ~125 vectors, pair work grows linearly)
  *
  *   runMain graft.tools.SemProbe
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def semdedup(dir: String, k: Int): Long = {
      val emb = graft.Tables.embeddings(spark, dir)
      val cents = KMeans.fit(emb, "vec_id", "embedding", k, iters = 3)
      val assign = emb.select($"vec_id",
          transform($"embedding", _.cast("double")).as("v"),
          KMeans.cellExpr($"embedding", cents).cast("long").as("cell"))
        .localCheckpoint(false)
      val a = assign.select($"cell", $"vec_id".as("a_id"), $"v".as("a_v"))
      val b = assign.select($"cell", $"vec_id".as("b_id"), $"v".as("b_v"))
      a.join(b, Seq("cell"))
        .filter($"a_id" < $"b_id" && cosine($"a_v", $"b_v") >= 0.45)
        .select($"b_id").distinct().count()
    }

    for ((dir, tag, ks) <- Seq(
        ("/root/testdata/sf0.1", "sf0.1", Seq(16)),
        (".scale/sf1", "sf1", Seq(16, 160)))) {
      for (k <- ks) {
        val runs = (0 to 2).map { _ =>
          val t0 = System.nanoTime()
          val removed = semdedup(dir, k)
          ((System.nanoTime() - t0) / 1e9, removed)
        }
        println(f"SEMPROBE $tag%-6s k=$k%-4d removed=${runs.head._2}%,d " +
          f"min=${runs.map(_._1).min}%.2f warm=${runs.head._1}%.2f")
      }
    }
    spark.stop()
  }
}
