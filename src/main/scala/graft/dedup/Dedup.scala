package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication for training corpora.
  *
  * Exact and normalized dedup are hash-groupBys (one shuffle on the
  * content hash — at 100 TB the hash is 16 bytes/row, not the text).
  * Near-dup detection uses the inverted-index ("token join")
  * formulation of set similarity: explode distinct shingles, join on
  * shingle, aggregate intersection counts. That is linear in total
  * postings, never materializes the O(N²) pair space, and is exactly
  * the plan a dedicated similarity-join engine would run. For corpora
  * where even postings blow up, [[MinHash]] prunes candidates first.
  */
object Dedup {

  /** Keep-first exact dedup groups: one row per distinct content hash. */
  def exactGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text)).as("content_hash"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Same, on whitespace/case-normalized text. */
  def normalizedGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(text)).as("content_hash"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** (id, shingle) postings with per-doc-distinct shingles. */
  def shinglePostings(df: DataFrame, id: String, text: String,
      n: Int): DataFrame =
    TextAnalysis.shingleDocs(df, id, text, n)
      .select(col("__id"),
        explode(array_distinct(col("__shingles"))).as("shingle"))

  /** Exact n-gram-shingle Jaccard pairs ≥ threshold, via the
    * inverted-index join. Output: (a_id, b_id, jaccard).
    *
    * Negative result (r14, measured at the sf1 probe): carrying the
    * shingle-set size on every posting row (size is known at explode
    * time) to replace the two post-aggregation sizes joins with
    * first() under the pair key DOUBLED runtime (5.5 s → 10.1 s).
    * The match stream out of the self-join — the plan's largest
    * shuffle, one row per co-occurring shingle pair — widened by
    * 16 bytes/row, while the joins it removed run on the
    * POST-aggregation pairs relation, which is orders of magnitude
    * smaller. Keep sizes as separate cheap joins; never widen the
    * pre-aggregation stream. */
  def jaccardPairs(df: DataFrame, id: String, text: String,
      n: Int, threshold: Double): DataFrame = {
    // localCheckpoint, not cache(): the postings feed three plan arms
    // (sizes + both self-join sides), but a DataFrame cache is pinned
    // by the CacheManager until an explicit unpersist — which a lazy
    // return can never safely issue — and would accumulate across
    // queries in a long-lived session. Checkpoint blocks are released
    // by the ContextCleaner once the plan is unreferenced.
    val post = shinglePostings(df, id, text, n).localCheckpoint()
    val sizes = post.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    val inter = interCounts(post)
    inter
      .join(sizes.select(col("__id").as("a_id"), col("__n").as("__na")), "a_id")
      .join(sizes.select(col("__id").as("b_id"), col("__n").as("__nb")), "b_id")
      .withColumn("jaccard",
        col("__i").cast("double") / (col("__na") + col("__nb") - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Per-pair intersection counts |A∩B| over the postings — the
    * inverted-index core shared by [[jaccardPairs]] and
    * [[containmentPairs]]. Formulated as the per-group sorted-array
    * pair comb (the coOrderPairs/q_triangles shape): ONE shuffle on
    * the shingle + the codegen'd in-row comb replaces the former
    * self-join, which exchanged the postings TWICE (both join sides
    * hash on shingle) before emitting the identical match stream.
    * Memory per shingle group is unchanged — the sort-merge join
    * buffered one side's equal-key group exactly like the collected
    * list here — and ids-per-shingle are distinct, so the strict comb
    * on the sorted list emits each a < b pair once with the same
    * multiplicity the join produced. */
  private def interCounts(post: DataFrame): DataFrame =
    post.groupBy(col("shingle"))
      .agg(sort_array(collect_list(col("__id"))).as("__ids"))
      .select(explode(graft.functions.ArrayPairs.of(col("__ids"),
        strict = true)).as("__pr"))
      .groupBy(col("__pr.p1").as("a_id"), col("__pr.p2").as("b_id"))
      .agg(count(lit(1)).as("__i"))

  /** Shingle-set CONTAINMENT pairs: |A∩B| / min(|A|, |B|) ≥ threshold
    * — the asymmetric near-dup test Jaccard misses: a short document
    * quoted whole inside a long one has tiny Jaccard (the union is
    * dominated by the long doc) but containment ≈ 1. Same
    * inverted-index join as [[jaccardPairs]] (linear in postings, no
    * all-pairs arm); only the normalizer differs. Output:
    * (a_id, b_id, containment). */
  def containmentPairs(df: DataFrame, id: String, text: String,
      n: Int, threshold: Double): DataFrame = {
    val post = shinglePostings(df, id, text, n).localCheckpoint()
    val sizes = post.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    val inter = interCounts(post) // one-exchange pair comb, see above
    inter
      .join(sizes.select(col("__id").as("a_id"), col("__n").as("__na")), "a_id")
      .join(sizes.select(col("__id").as("b_id"), col("__n").as("__nb")), "b_id")
      .withColumn("containment",
        col("__i").cast("double") / least(col("__na"), col("__nb")))
      .filter(col("containment") >= threshold)
      .select(col("a_id"), col("b_id"), col("containment"))
  }

  /** Connected components over undirected dup pairs. Output:
    * (node, component) where component = min reachable id.
    *
    * Hybrid execution: below `localThreshold` edges the graph is
    * collected and solved with union-find on the driver (dup-pair
    * graphs are normally tiny relative to the corpus, and a
    * distributed iteration pays multi-second scheduling latency per
    * round); above it, iterative min-label propagation runs fully
    * distributed (converges in O(diameter) join rounds).
    *
    * `localThreshold` = 1M edges ≈ 16 MB of driver pair arrays plus
    * the union-find maps — comfortable headroom under any sane driver
    * heap. A 100 TB near-dup graph blows past it and takes the
    * distributed path; DedupSpec exercises that path explicitly. */
  def connectedComponents(pairs: DataFrame, a: String, b: String,
      maxIter: Int = 20, localThreshold: Long = 1000000L): DataFrame = {
    // localCheckpoint (not cache — see jaccardPairs): sized by
    // count(), then consumed again below
    val p = pairs.localCheckpoint()
    val edgeCount = p.count()
    if (edgeCount <= localThreshold)
      return localComponents(p, a, b)
    // localCheckpoint (eager) truncates lineage: without it each
    // iteration's plan re-derives the candidate-pair join from scratch
    // and the final plan grows exponentially with iterations.
    val edges = p.select(col(a).as("src"), col(b).as("dst"))
      .unionAll(p.select(col(b).as("src"), col(a).as("dst")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // hook: take the min of my own and my neighbors' labels
      val prop = edges
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("component", "dst_comp"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("dst_comp")).as("nbr_comp"))
      val hooked = labels.join(prop, Seq("node"), "left")
        .select(col("node"),
          least(col("component"),
            coalesce(col("nbr_comp"), col("component"))).as("component"))
      // jump: follow my label's label (pointer doubling). Labels are
      // always node ids inside the same component, so the self-join
      // stays component-local; each round halves label-chain lengths,
      // making convergence O(log diameter) instead of O(diameter) —
      // hook-only propagation silently hit maxIter on a 100-node
      // chain and returned unmerged components.
      val jumped = hooked.select(col("node").as("_jn"),
        col("component").as("_jc"))
      val next = hooked.join(jumped, col("component") === col("_jn"), "left")
        .select(col("node"),
          coalesce(col("_jc"), col("component")).as("component"))
        .localCheckpoint()
      changed = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.component") =!= col("o.component")).count()
      labels = next
      it += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents: no convergence after $maxIter rounds — " +
          "a silent partial merge would corrupt downstream dedup")
    labels
  }

  /** Driver-side union-find with path compression (small graphs). */
  private def localComponents(pairs: DataFrame, a: String,
      b: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col(a).cast("long"), col(b).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val p = parent(c); parent(c) = r; c = p }
      r
    }
    edges.foreach { case (x, y) =>
      parent.getOrElseUpdate(x, x); parent.getOrElseUpdate(y, y)
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(rx) = ry
    }
    val nodes = parent.keys.toSeq
    val minOfRoot = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
    nodes.sorted.map(n => (n, minOfRoot(find(n)))).toDF("node", "component")
  }
}
