package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.similarity.Similarity

/** Batch-regime ANN scaling probe: times `lshTopK`/`ivfTopK` with
  * `broadcastQueries = false` (both posting sides shuffle) at query-set
  * sizes Q and 10Q against a fixed corpus — the claim under test is
  * that batch-regime wall grows LINEARLY in |Q|, i.e. the shuffle join
  * removed the broadcast path's executor-memory ceiling without
  * smuggling in a quadratic term.
  *
  *   runMain graft.tools.AnnProbe <sfDir> <q>
  *
  * prints min-of-3 wall per (op, |Q|) pair. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val q0 = if (args.length > 1) args(1).toInt else 1000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.Tables.embeddings(spark, sfDir).cache()
    val n = emb.count()
    println(s"corpus: $n vectors")

    def timed(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (0 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label%-28s min=${runs.tail.min}%.2f warm=${runs.head}%.2f")
    }

    for (q <- Seq(q0, q0 * 10)) {
      val queries = emb.filter(col("vec_id") < q)
      // nPlanes=4 is the recall-oriented interactive config (16
      // buckets/table → heavy candidate fan-out); the batch regime
      // scales the bucket count with the corpus — nPlanes=8 is the
      // honest batch operating point here (256 buckets/table)
      timed(s"lsh_batch_p4_q$q") {
        Similarity.lshTopK(emb, queries, "vec_id", "embedding", 10,
          dim = 64, nPlanes = 4, nTables = 16, broadcastQueries = false)
      }
      timed(s"lsh_batch_p8_q$q") {
        Similarity.lshTopK(emb, queries, "vec_id", "embedding", 10,
          dim = 64, nPlanes = 8, nTables = 16, broadcastQueries = false)
      }
      timed(s"ivf_batch_q$q") {
        Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 10,
          nCells = 16, nprobe = 4, broadcastQueries = false)
      }
    }
    spark.stop()
  }
}
