package graft

import graft.dedup.{Dedup, MinHash, SimHash}
import org.apache.spark.sql.functions.sum
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def docs = Tables.documents(spark, TestSpark.sf)

  test("LSH candidates are a superset of exact jaccard pairs >= 0.5") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = MinHash.candidatePairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "no near-dup pairs at sf0.001 — vacuous test")
    assert(exact.subsetOf(cands),
      s"LSH missed ${exact -- cands}")
  }

  test("minhash near-dup pairs equal the exact jaccard join") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = MinHash.nearDupPairs(docs, "doc_id", "text", 3, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == exact)
  }

  test("simhash near pairs respect the hamming bound and catch near-dups") {
    val pairs = SimHash.nearPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect()
    assert(pairs.forall(_.getLong(2) <= 3))
  }

  test("connected components merge transitive dup chains") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val cc = Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("distributed label propagation agrees with driver union-find") {
    import spark.implicits._
    // a graph that needs several propagation rounds: two long chains
    // (diameter 49), a star, cross-links, and isolated-pair noise
    val chainA = (0L until 50L).sliding(2).map(s => (s(0), s(1))).toSeq
    val chainB = (100L until 150L).sliding(2).map(s => (s(1), s(0))).toSeq
    val star = (201L to 220L).map(n => (200L, n))
    val cross = Seq((49L, 100L)) // joins chain A and chain B
    val pairs = Seq((300L, 301L), (302L, 303L))
    val edges = (chainA ++ chainB ++ star ++ cross ++ pairs).toDF("a", "b")
    // localThreshold = 0 forces the distributed path the 100 TB graph
    // takes; the driver union-find is the oracle
    val dist = Dedup.connectedComponents(edges, "a", "b", localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == local)
    // chains A+B merged through the cross edge → one component
    assert(dist(149L) == 0L && dist(49L) == 0L)
    assert(dist(220L) == 200L)
  }

  test("jaro sort key (7-byte zero-padded prefix) is monotone in string order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // short names, prefix ties, and multi-byte UTF-8 — the cases the
    // unpadded character-wise key got wrong (length-before-content
    // ordering; Long overflow past 7 chars of multi-byte text)
    val names = Seq("b", "ab", "abcdefgh", "abcdefg", "a", "ab cd",
      "zz", "中文テキスト長い", "éclair", "abcdefg999")
    val nk = conv(hex(rpad(substring($"name".cast("binary"), 1, 7), 7,
      Array[Byte](0))), 16, 10).cast("long")
    val got = names.toDF("name").select($"name", nk.as("nk"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // Spark string order = UTF8 byte order; nk must never invert it
    val sorted = names.sorted
    sorted.zip(sorted.tail).foreach { case (lo, hi) =>
      assert(got(lo) <= got(hi),
        s"nk inverts order: '$lo'(${got(lo)}) vs '$hi'(${got(hi)})")
    }
    // and no overflow/null for multi-byte input
    assert(got.values.forall(_ >= 0L))
  }

  test("exact dedup keeps one row per distinct content") {
    val total = docs.count()
    val kept = Dedup.exactGroups(docs, "doc_id", "text")
    assert(kept.agg(sum("n_copies")).head.getLong(0) == total)
  }

  test("semdedup partitions the corpus and only removes within-cell dups") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val total = emb.count()
    val rep = dedup.DedupQueries.queries("dedup_semdedup")(spark, TestSpark.sf)
      .collect()
    // every vector lands in exactly one cell; removals never exceed
    // cell population − 1 (at least one representative survives)
    assert(rep.map(_.getLong(1)).sum == total)
    assert(rep.forall(r => r.getLong(2) >= 0 && r.getLong(2) < r.getLong(1)))
  }
}
