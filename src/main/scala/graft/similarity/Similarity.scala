package graft.similarity

import graft.Util.cosine
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (Array[Float]).
  *
  * Brute-force top-k broadcasts the query set (queries ≪ corpus) so
  * the corpus is scanned once with no shuffle; ranking shuffles only
  * (qid, nid, score) triples. The LSH and IVF variants are the scale
  * paths: they route each query to a bucket/partition so the scan
  * touches corpus/|buckets| instead of everything.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector (inner product space
    * = cosine). Output: (qid, nid, cos). */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("qid"), col(vec).as("__qv"))
    val c = graft.Util.ensureParallelism(
      corpus.select(col(id).as("nid"), col(vec).as("__cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rank"))
  }

  /** Maximum-inner-product top-k (the recommendation-scoring
    * objective: rank items by raw dot product, NOT by angle) via the
    * norm-augmentation reduction: append sqrt(M² − |x|²) to each
    * corpus vector (M² = max corpus squared norm) and 0 to each query
    * — every augmented corpus vector then has norm exactly M, so
    * cosine order over the augmented space IS dot-product order over
    * the original. That one identity lets the SAME cosine ANN
    * infrastructure (LSH tables, IVF cells) serve MIPS at scale;
    * [[augment]] builds the augmented column and SimilaritySpec pins
    * the recall of augmented-LSH routing against this exact ranking.
    * This entry is the exact form: ranked by the augmented cosine,
    * returning the raw dot. Queries broadcast (queries ≪ corpus). */
  def mipsTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int): DataFrame = {
    val dot = graft.functions.ArrayDot.dot _
    // M² = the max corpus squared norm — one scalar agg; exact for
    // the augmentation because each |x|² below recomputes the SAME
    // expression, so M² − |x|² ≥ 0 bit-for-bit
    val m2 = corpus.agg(max(dot(col(vec), col(vec)))).head().getDouble(0)
    val c = graft.Util.ensureParallelism(
      corpus.select(col(id).as("nid"), col(vec).as("__cv")))
      .withColumn("__aug2",
        lit(m2) - dot(col("__cv"), col("__cv")))
    val q = queries.select(col(id).as("qid"), col(vec).as("__qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("dot", dot(col("__qv"), col("__cv")))
      // augmented cosine = dot / (|q| · |x_aug|): monotone in dot for
      // a fixed query — the ordering the ANN engine would see
      .withColumn("__cosaug", col("dot") /
        sqrt(dot(col("__qv"), col("__qv")) *
          (dot(col("__cv"), col("__cv")) + col("__aug2"))))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("__cosaug").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("dot"), col("rank"))
  }

  /** The norm-augmented vector column for routing MIPS through a
    * cosine ANN: original floats plus the sqrt(M² − |x|²) tail
    * component (queries append 0 instead). */
  def augment(vec: Column, m2: Double): Column =
    concat(vec, array(sqrt(lit(m2) -
      graft.functions.ArrayDot.dot(vec, vec)).cast("float")))

  /** Deterministic ±1 hyperplane signs for (table, plane) over `dim`
    * dimensions — Knuth multiplicative hashing of the flat index, no
    * RNG, so the Spark literals and the DuckDB oracle's literals are
    * generated from the SAME code and the bucket assignment is
    * reproducible in both engines. */
  def planeSigns(table: Int, plane: Int, dim: Int): Seq[Double] =
    (0 until dim).map { i =>
      val x = ((table * 1009 + plane) * 4096 + i).toLong
      val h = (x * 2654435761L) & 0xFFFFFFFFL
      if (((h >> 16) & 1L) == 0L) 1.0 else -1.0
    }

  /** Random-hyperplane LSH bucket id (nPlanes-bit signature) for one
    * hash table, computed row-local — no shuffle. The sign vectors
    * are plan literals; each plane is one codegen'd [[graft.functions.ArrayDot]]
    * over the embedding (no per-row hashing, no intermediate array). */
  def lshBucket(vec: Column, nPlanes: Int, table: Int, dim: Int): Column =
    (0 until nPlanes).map { p =>
      val dot = graft.functions.ArrayDot.dot(vec,
        typedlit(planeSigns(table, p, dim)))
      when(dot > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** (table, bucket) posting rows — L tables OR-amplify recall:
    * P(candidate) = 1−(1−p^planes)^tables. All L bucket ids come from
    * ONE codegen'd [[graft.functions.LshBuckets]] pass (the literal
    * per-table struct formulation put 4096 literal doubles in the
    * generator, broke the codegen unit, and ran the posting stage
    * interpreted — see that expression's scaladoc); posexplode's
    * position IS the table id, so the output schema is unchanged. */
  def lshPostings(df: DataFrame, nPlanes: Int, nTables: Int,
      dim: Int): DataFrame =
    df.select(col("*"), posexplode(graft.functions.LshBuckets.of(
        col("__vec"), nPlanes, nTables)).as(Seq("__table", "__bucket")))

  /** ANN top-k over the union of the query's buckets across L hash
    * tables. Recall < 1 by construction; spec-tested vs bruteTopK and
    * oracle-replayed in DuckDB (same literal hyperplanes).
    *
    * `broadcastQueries` picks the join regime for the posting join:
    *   - true (default) — the interactive regime, Q ≪ corpus: the
    *     query postings broadcast, the corpus never shuffles.
    *   - false — the BATCH regime (score a huge query set against a
    *     huge corpus, e.g. 100M queries × 1B items): both posting
    *     sides hash-shuffle on (table, bucket), so neither has to fit
    *     in an executor and cost stays linear in |Q| + |corpus| per
    *     table. Identical results by construction — only the exchange
    *     strategy changes (spec-asserted both ways).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int, dim: Int, nPlanes: Int = 4,
      nTables: Int = 16, broadcastQueries: Boolean = true): DataFrame = {
    val c = lshPostings(
      corpus.select(col(id).as("nid"), col(vec).as("__vec")),
      nPlanes, nTables, dim)
    val q0 = lshPostings(queries.select(col(id).as("qid"),
      col(vec).as("__vec")), nPlanes, nTables, dim)
      .withColumnRenamed("__vec", "__qv")
    val q = if (broadcastQueries) broadcast(q0) else q0
    // Score each bucket collision IMMEDIATELY (codegen'd dot over the
    // two row-local arrays, map-side) so only (qid, nid, cos) triples
    // ever shuffle — never the embeddings. A pair colliding in
    // several tables scores identically in all of them, so its
    // duplicates are ADJACENT under (cos desc, nid asc): one
    // qid-partitioned exchange + sort serves dedup (lag ≠ previous
    // triple), ranking (row_number after the filter reuses the same
    // partitioning AND sort order — no second exchange), and the
    // top-k cut. The round-5 shape paid a distinct exchange carrying
    // full embedding arrays plus a separate window exchange.
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    c.join(q, Seq("__table", "__bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("__qv"), col("__vec")))
      .select(col("qid"), col("nid"), col("cos"))
      .withColumn("__dup",
        lag(struct(col("cos"), col("nid")), 1).over(w) ===
          struct(col("cos"), col("nid")))
      .filter(!coalesce(col("__dup"), lit(false)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rank"))
  }

  /** Element-wise mean vectors per partition key (IVF centroids).
    * posexplode → per-dimension avg → reassemble ordered array. */
  def centroids(df: DataFrame, key: String, vec: String): DataFrame =
    df.select(col(key), posexplode(col(vec)).as(Seq("__dim", "__x")))
      .groupBy(col(key), col("__dim"))
      .agg(avg(col("__x")).as("__m"))
      .groupBy(col(key))
      .agg(array_sort(collect_list(struct(col("__dim"), col("__m")))).as("__s"))
      .select(col(key), transform(col("__s"), s => s.getField("__m")).as("centroid"))

  /** IVF-style ANN: k-means coarse quantizer cells over the corpus;
    * each query searches only its nearest `nprobe` cells. The
    * centroid matrix (k×dim) is the only driver-side state; corpus
    * assignment and search stay fully distributed, turning O(N·Q)
    * into O(N·Q·nprobe/k).
    *
    * `broadcastQueries` as in [[lshTopK]]: true = interactive regime
    * (queries broadcast, corpus never shuffles); false = batch regime
    * (both sides hash-shuffle on the cell id — required when the
    * query set itself is corpus-scale). Identical results either
    * way; only the exchange strategy changes. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int, nCells: Int = 16, nprobe: Int = 4,
      kmeansIters: Int = 5, broadcastQueries: Boolean = true): DataFrame = {
    val cents = KMeans.fit(corpus, id, vec, nCells, kmeansIters)
    val c = graft.Util.ensureParallelism(
      corpus.select(col(id).as("nid"), col(vec).as("__cv")))
      .withColumn("__cell", KMeans.cellExpr(col("__cv"), cents))
    val q0 = queries.select(col(id).as("qid"), col(vec).as("__qv"),
        explode(KMeans.probeExpr(col(vec), cents, nprobe)).as("__cell"))
    val q = if (broadcastQueries) broadcast(q0) else q0
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    c.join(q, "__cell")
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rank"))
  }

  /** All pairs with cosine ≥ threshold (brute pairwise — correctness
    * baseline; LSH/IVF bucket joins are the scale path).
    *
    * The result is lazily checkpointed: the subtree is a broadcast
    * nested-loop join with NO exchange boundary, so a caller's
    * `orderBy` (range partitioning) would otherwise execute the
    * whole O(n²) scoring TWICE — once for the range-boundary
    * sampling pass, once for real (measured: the two equal 135
    * CPU-s stages in dedup_embed's sf1 probe). The checkpointed
    * frame is just the ≥-threshold survivors — tiny. */
  def similarityJoin(df: DataFrame, id: String, vec: String,
      threshold: Double): DataFrame = {
    val a = graft.Util.ensureParallelism(
      df.select(col(id).as("a_id"), col(vec).as("__va")))
    val b = df.select(col(id).as("b_id"), col(vec).as("__vb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", cosine(col("__va"), col("__vb")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos"))
      .localCheckpoint(false)
  }
}
