package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over the supplier co-supply graph: suppliers are linked
  * when they supply the same order (per-order fanout is bounded by
  * lines-per-order, so edge construction is linear in lineitem).
  *
  * The iteration is the standard distributed form — contributions
  * flow along edges (one shuffle per step keyed on dst), ranks stay
  * edge-partitioned, and `localCheckpoint` truncates lineage so step
  * N's plan doesn't re-derive steps 1..N-1. Driver state is just the
  * loop counter; ranks never leave the cluster.
  */
object PageRank extends QueryModule {

  /** damping 0.85, `iters` fixed steps (deterministic). */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .localCheckpoint()
    val outW = sym.groupBy("src").agg(sum("w").as("out_w"))
    val wd = sym.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("out_w")).as("frac"))
      .localCheckpoint()
    var ranks = wd.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1.0)).localCheckpoint()
    for (i <- 1 to iters) {
      ranks = wd.join(ranks, wd("src") === ranks("node"))
        .groupBy(col("dst").as("node2"))
        .agg((lit(0.15) + lit(0.85) * sum(col("rank") * col("frac")))
          .as("rank"))
        .withColumnRenamed("node2", "node")
      // checkpoint every 3rd step: enough to keep the plan shallow,
      // 3× fewer forced materializations than checkpointing each step
      if (i % 3 == 0 || i == iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  val queries: Map[String, Q] = Map(
    // rows-only: ranks come from a fixed-point iteration SQL can't
    // express without recursive CTE gymnastics; PageRankSpec pins
    // conservation, determinism, and positivity instead.
    "q_pagerank" -> ((s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d).select($"l_orderkey", $"l_suppkey")
      val pairs = li.as("a").join(li.as("b"),
          $"a.l_orderkey" === $"b.l_orderkey" &&
            $"a.l_suppkey" < $"b.l_suppkey")
        .select($"a.l_suppkey".as("src"), $"b.l_suppkey".as("dst"))
      run(pairs, iters = 10)
        .select($"node", r4($"rank").as("rank"))
        .orderBy($"rank".desc, $"node")
        .limit(20)
    })
  )

  val oracles: Map[String, String] = Map.empty
}
