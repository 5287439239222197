package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distributed connected-components probe: drives the hook +
  * pointer-doubling label-propagation path (localThreshold = 0, so
  * the driver union-find shortcut is out of the picture) on
  * deterministic graphs of E and 10E edges with FIXED diameter —
  * wall per round should grow linearly with edges while the round
  * count stays O(log diameter), which is the whole scale claim of
  * the distributed path (`dedup_clusters` at oracle SF rides the
  * union-find shortcut, so this path had no timing datapoint).
  *
  * Graph: disjoint 64-node chains (the pointer-doubling stress —
  * hook-only propagation needs 64 rounds, doubling needs ~6) plus
  * 100-node stars (the bulk). Component counts are exact by
  * construction and asserted.
  *
  *   runMain graft.tools.CcProbe [edges]   (default 2M, then ×10)
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val e0 = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (edges <- Seq(e0, e0 * 10)) {
      // half the edges in 64-node chains, half in 100-node stars;
      // node id spaces disjoint by construction
      val chainEdges = edges / 2
      val starEdges = edges - chainEdges
      val chainBase = 0L
      val starBase = 4L * edges // far past any chain node id
      // chains: node i -> i+1 except at 64-boundaries
      val chains = spark.range(chainEdges + chainEdges / 63 + 64)
        .filter(pmod($"id", lit(64)) =!= 63)
        .limit(chainEdges.toInt)
        .select(($"id" + chainBase).as("a"), ($"id" + chainBase + 1).as("b"))
      // stars: node j -> its 100-block center
      val stars = spark.range(starEdges)
        .filter(pmod($"id", lit(100)) =!= 0)
        .select(($"id" + starBase).as("a"),
          (($"id" - pmod($"id", lit(100))) + starBase).as("b"))
      val pairs = chains.unionAll(stars).localCheckpoint()
      val nEdges = pairs.count()
      val runs = (0 to 2).map { _ =>
        val t0 = System.nanoTime()
        val cc = graft.dedup.Dedup.connectedComponents(
          pairs, "a", "b", localThreshold = 0L)
        val nComp = cc.select($"component").distinct().count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, nComp)
      }
      println(f"CCPROBE edges=$nEdges%,d comps=${runs.head._2}%,d " +
        f"min=${runs.map(_._1).min}%.2f warm=${runs.head._1}%.2f")
    }
    spark.stop()
  }
}
