package graft

import graft.similarity.Similarity
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def emb = Tables.embeddings(spark, TestSpark.sf)

  private def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("qid", "nid").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

  /** keys.toSeq matters: mapping over the key *Set* would collapse
    * equal per-query recalls before summing. */
  private def recallOf(brute: Map[Long, Set[Long]],
      got: Map[Long, Set[Long]]): Double =
    brute.keys.toSeq.map { k =>
      got.getOrElse(k, Set.empty).intersect(brute(k)).size / 10.0
    }.sum / brute.size

  test("brute-force top-k returns k ranked neighbors per query") {
    import spark.implicits._
    val res = Similarity.bruteTopK(emb, emb.filter($"vec_id" < 5),
      "vec_id", "embedding", 10)
    val byQ = res.collect().groupBy(_.getLong(0))
    assert(byQ.size == 5)
    assert(byQ.values.forall(_.length == 10))
    // ranks are 1..10 and cos non-increasing
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to 10))
      val cs = sorted.map(_.getDouble(2)).toSeq
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH top-k recall vs brute force") {
    import spark.implicits._
    val q = emb.filter($"vec_id" < 20)
    val brute = topkSet(Similarity.bruteTopK(emb, q, "vec_id", "embedding", 10))
    val lsh = topkSet(Similarity.lshTopK(emb, q, "vec_id", "embedding", 10,
      dim = 64, nPlanes = 4, nTables = 16))
    val recall = recallOf(brute, lsh)
    info(f"LSH recall@10 (4 planes x 16 tables) = $recall%.3f")
    // production bar: 16 OR-amplifying tables measure 0.85-0.96 across
    // the sf0.001-sf0.1 corpora (round-11 sweep); 0.8 leaves noise room
    assert(recall >= 0.8, f"LSH recall collapsed: $recall%.3f")
  }

  test("MIPS: exact ranking equals brute dot order; augmented LSH routes it") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val q = emb.filter($"vec_id" < 20)
    val exact = Similarity.mipsTopK(emb, q, "vec_id", "embedding", 10)
    // 1. the augmented-cosine ranking must equal the raw dot ranking
    //    (the reduction's whole claim) — recompute dots and check each
    //    query's list is non-increasing with rank
    val byQ = exact.collect().groupBy(_.getLong(0))
    assert(byQ.size == 20 && byQ.values.forall(_.length == 10))
    byQ.values.foreach { rows =>
      val dots = rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(dots.zip(dots.tail).forall { case (a, b) => a >= b },
        s"augmented-cosine order broke dot monotonicity: $dots")
    }
    // 2. the SCALE path: augmented vectors through the existing cosine
    //    LSH recover the MIPS top-k with production recall
    val dotC = graft.functions.ArrayDot.dot _
    val m2 = emb.agg(max(dotC($"embedding", $"embedding")))
      .head().getDouble(0)
    val corpusAug = emb.select($"vec_id",
      Similarity.augment($"embedding", m2).as("av"))
    val qAug = q.select($"vec_id",
      concat($"embedding", array(lit(0.0f))).as("av"))
    val lsh = topkSet(Similarity.lshTopK(corpusAug, qAug, "vec_id", "av",
      10, dim = 65, nPlanes = 4, nTables = 16))
    val recall = recallOf(topkSet(exact), lsh)
    info(f"augmented-LSH MIPS recall@10 = $recall%.3f")
    assert(recall >= 0.7, f"MIPS-via-LSH recall collapsed: $recall%.3f")
  }

  test("PQ-ADC top-k: 32x compression, recall vs exact-L2 brute force") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.similarity.Pq
    val cb = Pq.fit(emb, "vec_id", "embedding", m = 8, k = 16)
    // compression claim: 64 float dims (256 B) → 8 codes of 4 bits
    assert(cb.size == 8 && cb.forall(_.size == 16) &&
      cb.forall(_.forall(_.size == 8)))
    val q = emb.filter($"vec_id" < 20)
    val pq = topkSet(Pq.topK(emb, q, "vec_id", "embedding", cb,
      k = 10, shortlist = 50))
    // exact-L2 ground truth (PQ quantizes L2, so the fair reference)
    val sq = (a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) => (a - b) * (a - b)
    val c = emb.select($"vec_id".as("nid"),
      transform($"embedding", _.cast("double")).as("cv"))
    val brute = topkSet(c.crossJoin(broadcast(
        q.select($"vec_id".as("qid"),
          transform($"embedding", _.cast("double")).as("qv"))))
      .filter($"qid" =!= $"nid")
      .withColumn("l2", aggregate(zip_with($"qv", $"cv", sq),
        lit(0.0), (acc, e) => acc + e))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy($"l2".asc, $"nid".asc)))
      .filter($"rank" <= 10))
    val recall = recallOf(brute, pq)
    info(f"PQ-ADC recall@10 (m=8, k=16, shortlist=50) = $recall%.3f")
    assert(recall >= 0.5, f"PQ recall collapsed: $recall%.3f")
    // every query returns exactly k ranked rows
    assert(pq.size == 20 && pq.values.forall(_.size == 10))
    // the codegen'd encoder is bit-identical to the HOF reference form
    val both = emb.select(
      graft.functions.PqCodes.of($"embedding", cb).as("fast"),
      Pq.codeExpr($"embedding", cb).as("ref"))
    assert(both.filter($"fast" =!= $"ref").count() === 0,
      "PqCodes diverged from the HOF reference encoding")
  }

  test("IVF-PQ top-k: pruned scan + compressed scoring, recall holds") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.similarity.{KMeans, Pq}
    val cb = Pq.fit(emb, "vec_id", "embedding", m = 8, k = 16)
    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 3)
    val q = emb.filter($"vec_id" < 20)
    val ann = Pq.ivfPqTopK(emb, q, "vec_id", "embedding", k = 10,
      nCells = 16, nprobe = 4, codebooks = cb, centroids = cents,
      shortlist = 50)
    // one cell per corpus vector ⇒ no (qid, nid) pair can duplicate
    val dups = ann.groupBy($"qid", $"nid").count()
      .filter($"count" > 1).count()
    assert(dups == 0, "cell join duplicated a candidate pair")
    val got = topkSet(ann)
    val sq = (a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) => (a - b) * (a - b)
    val c = emb.select($"vec_id".as("nid"),
      transform($"embedding", _.cast("double")).as("cv"))
    val brute = topkSet(c.crossJoin(broadcast(
        q.select($"vec_id".as("qid"),
          transform($"embedding", _.cast("double")).as("qv"))))
      .filter($"qid" =!= $"nid")
      .withColumn("l2", aggregate(zip_with($"qv", $"cv", sq),
        lit(0.0), (acc, e) => acc + e))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy($"l2".asc, $"nid".asc)))
      .filter($"rank" <= 10))
    val recall = recallOf(brute, got)
    info(f"IVF-PQ recall@10 (nprobe=4/16, m=8, shortlist=50) = $recall%.3f")
    // composition loses to each component alone (routing misses stack
    // on quantization error) — the gate is the production bar, not
    // the component bars
    assert(recall >= 0.3, f"IVF-PQ recall collapsed: $recall%.3f")
  }

  test("IVF top-k recall vs brute force") {
    import spark.implicits._
    val q = emb.filter($"vec_id" < 20)
    val brute = topkSet(Similarity.bruteTopK(emb, q, "vec_id", "embedding", 10))
    val ivf = topkSet(Similarity.ivfTopK(emb, q, "vec_id", "embedding",
      10, nCells = 16, nprobe = 4))
    val recall = recallOf(brute, ivf)
    info(f"IVF recall@10 (nprobe=4/16) = $recall%.3f")
    assert(recall >= 0.3, f"IVF recall collapsed: $recall%.3f")
  }

  /** The batch regime (broadcastQueries = false): a corpus-scale
    * query set can't broadcast, so the posting/cell join must shuffle
    * BOTH sides. Same results as the broadcast path — only the
    * exchange strategy may differ — and the plan genuinely drops the
    * explicit broadcast of the query postings. */
  test("batch-regime LSH/IVF equals the broadcast path; no forced broadcast") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val q = emb.filter($"vec_id" < 20)

    val lshB = Similarity.lshTopK(emb, q, "vec_id", "embedding", 10,
      dim = 64, nPlanes = 4, nTables = 16)
    val lshS = Similarity.lshTopK(emb, q, "vec_id", "embedding", 10,
      dim = 64, nPlanes = 4, nTables = 16, broadcastQueries = false)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid"), col("nid"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
    assert(rows(lshS) === rows(lshB),
      "batch LSH path diverged from the broadcast path")

    // IVF: the quantizer training is sample-order deterministic, so
    // both paths see the same cells; results must match exactly
    val ivfB = Similarity.ivfTopK(emb, q, "vec_id", "embedding",
      10, nCells = 16, nprobe = 4)
    val ivfS = Similarity.ivfTopK(emb, q, "vec_id", "embedding",
      10, nCells = 16, nprobe = 4, broadcastQueries = false)
    assert(rows(ivfS) === rows(ivfB),
      "batch IVF path diverged from the broadcast path")

    // plan check under autoBroadcastJoinThreshold=-1: with the size
    // heuristic off, a broadcast can only appear if the plan FORCES
    // it via hint — so the batch path must have zero and the
    // interactive path keeps its hinted one. (With the threshold on,
    // Catalyst is free to broadcast the tiny test corpus on its own —
    // that is exactly the optimizer freedom the batch path restores.)
    def forcedBroadcasts(mk: => org.apache.spark.sql.DataFrame): Int = {
      val key = "spark.sql.autoBroadcastJoinThreshold"
      val saved = spark.conf.get(key)
      spark.conf.set(key, "-1")
      try mk.queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.size
      finally spark.conf.set(key, saved)
    }
    assert(forcedBroadcasts(Similarity.lshTopK(emb, q, "vec_id", "embedding",
      10, dim = 64, nPlanes = 4, nTables = 16,
      broadcastQueries = false)) == 0,
      "batch LSH plan still forces a broadcast of the posting join")
    assert(forcedBroadcasts(Similarity.ivfTopK(emb, q, "vec_id", "embedding",
      10, nCells = 16, nprobe = 4, broadcastQueries = false)) == 0,
      "batch IVF plan still forces a broadcast of the cell join")
    assert(forcedBroadcasts(Similarity.lshTopK(emb, q, "vec_id", "embedding",
      10, dim = 64, nPlanes = 4, nTables = 16)) >= 1,
      "interactive LSH lost its hinted broadcast — regime flag inverted?")
    assert(forcedBroadcasts(Similarity.ivfTopK(emb, q, "vec_id", "embedding",
      10, nCells = 16, nprobe = 4)) >= 1,
      "interactive IVF lost its hinted broadcast — regime flag inverted?")
  }
}
