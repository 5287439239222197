package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., PAMI 2011) — the standard
  * vector-index compression: split each d-dim vector into `m`
  * subspaces, vector-quantize each subspace against its own k-entry
  * codebook, and store only the m code indices. At k=16/m=8 a 64-dim
  * float vector (256 B) compresses to 8 nibble codes — 32× less
  * memory traffic on the scan, which is what makes a 1B-vector index
  * fit in RAM at 100 TB corpus scale.
  *
  * Queries score codes WITHOUT decompressing via ADC (asymmetric
  * distance computation): per query, one m×k lookup table of exact
  * query-subvector ↔ centroid distances; a candidate's approximate
  * squared L2 is then m table lookups — pure higher-order array
  * expressions here (zip_with + aggregate over plan-literal
  * codebooks), no UDFs.
  *
  * Training is FAISS-style: L2 Lloyd's per subspace on a bounded
  * deterministic sample (smallest ids — no RNG, replayable), driver
  * state = m×k×(d/m) doubles, independent of corpus size. Encoding
  * and scoring stay fully distributed.
  */
object Pq {

  /** `codebooks(s)(j)` = centroid j of subspace s. */
  def fit(df: DataFrame, id: String, vec: String, m: Int, k: Int = 16,
      iters: Int = 5, maxTrain: Int = 4096): Seq[Seq[Seq[Double]]] = {
    val train: Array[Array[Double]] = df
      .select(col(id).as("__id"),
        transform(col(vec), _.cast("double")).as("__v"))
      .orderBy(col("__id")).limit(maxTrain)
      .collect().map(_.getSeq[Double](1).toArray)
    require(train.length >= k, s"need >= $k training vectors")
    val dim = train.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    (0 until m).map { s =>
      val xs = train.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
      def l2(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var i = 0
        while (i < sub) { val t = a(i) - b(i); d += t * t; i += 1 }
        d
      }
      // init = first k sample subvectors; ties → lower centroid index
      var cents = xs.take(k).map(_.clone)
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](sub))
        val counts = new Array[Long](k)
        for (v <- xs) {
          var best = 0; var bd = l2(v, cents(0))
          var c = 1
          while (c < k) {
            val dd = l2(v, cents(c))
            if (dd < bd) { best = c; bd = dd }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < sub) { sums(best)(i) += v(i); i += 1 }
        }
        cents = Array.tabulate(k)(c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
      }
      cents.map(_.toSeq).toSeq
    }
  }

  private def sq(c: Column): Column = c * c

  /** Squared L2 between a subvector of `vec` (subspace `s`, width
    * `sub`) and a codebook-centroid array column. */
  private def subDist(vec: Column, s: Int, sub: Int, cent: Column): Column =
    aggregate(sequence(lit(0), lit(sub - 1)), lit(0.0), (acc, i) =>
      acc + sq(element_at(vec, (lit(s * sub) + i + 1).cast("int"))
        .cast("double") - element_at(cent, (i + 1).cast("int"))))

  /** The m-entry PQ code (argmin-L2 centroid per subspace; ties →
    * first minimum, matching [[fit]]'s rule). */
  def codeExpr(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val sub = codebooks.head.head.size
    array(codebooks.indices.map { s =>
      val dists = transform(typedlit(codebooks(s)),
        c => subDist(vec, s, sub, c))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }: _*)
  }

  /** Per-query ADC lookup table: `lut(s)(j)` = exact squared L2
    * between the query's subspace-s subvector and centroid (s, j). */
  def lutExpr(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val sub = codebooks.head.head.size
    array(codebooks.indices.map { s =>
      transform(typedlit(codebooks(s)), c => subDist(vec, s, sub, c))
    }: _*)
  }

  /** ADC approximate squared L2: m lookups, no decompression. */
  def adcExpr(lut: Column, code: Column): Column =
    aggregate(zip_with(code, lut, (c, l) => element_at(l, c + 1)),
      lit(0.0), (acc, e) => acc + e)

  /** IVF-PQ top-k — the production ANN composition (FAISS `IVFx,PQy`
    * without residual encoding): the IVF coarse quantizer routes each
    * query to its `nprobe` nearest cells so only those cells' rows
    * are ever SCANNED (the pruning lever: at 1B vectors and
    * nprobe/nCells = 4/1024 the candidate stream is ~0.4% of the
    * corpus), and the visited rows are scored by PQ-ADC over their
    * m-nibble codes (the compression lever: 32× less memory traffic
    * than reading the float vectors), with the ADC shortlist reranked
    * by exact squared L2. Each corpus vector lives in exactly ONE
    * cell, so the cell join never duplicates a (query, candidate)
    * pair. Both trainings are deterministic (smallest-id samples),
    * so recall is bit-stable run to run. Output: (qid, nid, l2, rank). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int, nCells: Int, nprobe: Int,
      codebooks: Seq[Seq[Seq[Double]]], centroids: Seq[Seq[Double]],
      shortlist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coded = corpus.select(col(id).as("nid"),
      KMeans.cellExpr(col(vec), centroids).as("__cell"),
      graft.functions.PqCodes.of(col(vec), codebooks).as("__code"))
    val q = queries.select(col(id).as("qid"), col(vec).as("__qv"),
      lutExpr(col(vec), codebooks).as("__lut"),
      explode(KMeans.probeExpr(col(vec), centroids, nprobe)).as("__cell"))
    val wA = Window.partitionBy(col("qid"))
      .orderBy(col("__ad").asc, col("nid").asc)
    val short = coded.join(broadcast(q), "__cell")
      .filter(col("qid") =!= col("nid"))
      .withColumn("__ad", adcExpr(col("__lut"), col("__code")))
      .withColumn("__r", row_number().over(wA))
      .filter(col("__r") <= shortlist)
      .select(col("qid"), col("nid"), col("__qv"))
    rerankExact(short, corpus, id, vec, k)
  }

  /** Exact-L2 rerank of a (qid, nid, __qv) shortlist against the
    * original vectors — one semi-join back; only shortlist×queries
    * vectors are ever touched exactly. */
  private def rerankExact(short: DataFrame, corpus: DataFrame,
      id: String, vec: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exact = short
      .join(corpus.select(col(id).as("nid"), col(vec).as("__cv")), "nid")
      .withColumn("l2",
        aggregate(zip_with(col("__qv"), col("__cv"),
          (a, b) => sq(a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, e) => acc + e))
    val wE = Window.partitionBy(col("qid"))
      .orderBy(col("l2").asc, col("nid").asc)
    exact.withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("l2"), col("rank"))
  }

  /** PQ-ADC top-k: encode the corpus once, shortlist `shortlist`
    * candidates per query by ADC, rerank the shortlist by EXACT
    * squared L2 against the original vectors (one semi-join back —
    * only shortlist×queries vectors are ever touched exactly).
    * Output: (qid, nid, l2, rank). */
  def topK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, codebooks: Seq[Seq[Seq[Double]]], k: Int,
      shortlist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // corpus encoding is the hot path: the codegen'd expression, not
    // the HOF reference form (equivalence spec-pinned) — the HOF
    // nest evaluated interpreted at ~1 ms/vector
    val coded = corpus.select(col(id).as("nid"),
      graft.functions.PqCodes.of(col(vec), codebooks).as("__code"))
    val q = queries.select(col(id).as("qid"), col(vec).as("__qv"),
      lutExpr(col(vec), codebooks).as("__lut"))
    val wA = Window.partitionBy(col("qid"))
      .orderBy(col("__ad").asc, col("nid").asc)
    val short = coded.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("__ad", adcExpr(col("__lut"), col("__code")))
      .withColumn("__r", row_number().over(wA))
      .filter(col("__r") <= shortlist)
      .select(col("qid"), col("nid"), col("__qv"))
    rerankExact(short, corpus, id, vec, k)
  }
}
