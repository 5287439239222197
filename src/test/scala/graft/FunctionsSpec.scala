package graft

import graft.functions.{ArrayDot, GraftFunctions, ShingleHashes}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ArrayDot computes sequential double dot product") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(2.0, 4.0, 6.0)))
      .toDF("a", "b")
    val got = df.select(ArrayDot.dot(col("a"), col("b"))).head.getDouble(0)
    assert(got == 1.0 * 2 + 2 * 4 + 3 * 6)
  }

  test("ArrayDot throws on mismatched lengths instead of truncating") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(ArrayDot.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("length mismatch")))
  }

  test("ArrayDot null propagates") {
    import spark.implicits._
    val df = Seq((Option.empty[Seq[Double]], Seq(1.0)))
      .toDF("a", "b")
    assert(df.select(ArrayDot.dot(col("a"), col("b"))).head.isNullAt(0))
  }

  test("ArrayL1 equals the HOF reference form and guards lengths") {
    import spark.implicits._
    val df = Seq(
      (Seq(1, 5, 0, 7), Seq(3, 2, 0, 7)),
      (Seq(0, 0, 0, 0), Seq(9, 9, 9, 9)),
      (Seq(-3, 4, 2, 1), Seq(3, -4, 2, 1))).toDF("a", "b")
    val both = df.select(
      graft.functions.ArrayL1.of(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => abs(x - y).cast("long")), lit(0L),
        (acc, v) => acc + v).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
    val bad = Seq((Seq(1, 2, 3), Seq(1, 2))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(graft.functions.ArrayL1.of(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("length mismatch")))
    val withNull = Seq((Option.empty[Seq[Int]], Seq(1))).toDF("a", "b")
    assert(withNull.select(
      graft.functions.ArrayL1.of(col("a"), col("b"))).head.isNullAt(0))
  }

  test("array_dot is SQL-callable after registration") {
    GraftFunctions.registerAll(spark)
    val got = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head.getDouble(0)
    assert(got == 11.0)
  }

  test("shingle_hashes matches the composable shingle pipeline shape") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf).limit(200)
    // per-doc distinct-hash count must equal the distinct count of
    // string shingles from the split/slice/zip_with formulation
    val viaExpr = docs.select($"doc_id",
        explode_outer(ShingleHashes.of($"text", 5)).as("h"))
      .filter($"h".isNotNull)
      .groupBy($"doc_id").agg(countDistinct($"h").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPipe = graft.text.TextAnalysis
      .shingleDocs(docs, "doc_id", "text", 5)
      .select($"__id".as("doc_id"), explode($"__shingles").as("sh"))
      .groupBy($"doc_id").agg(countDistinct($"sh").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaPipe)
  }

  test("shingle_hashes edge cases: short docs empty, nulls null, SQL-callable") {
    import spark.implicits._
    val df = Seq(("a b c d e f", 0), ("a b", 1), ("  ", 2), ("one", 3))
      .toDF("t", "id")
    val got = df.select($"id", size(ShingleHashes.of($"t", 5)).as("k"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got == Map(0 -> 2, 1 -> 0, 2 -> 0, 3 -> 0))
    assert(df.limit(1).select(ShingleHashes.of(lit(null).cast("string"), 3))
      .head.isNullAt(0))
    GraftFunctions.registerAll(spark)
    assert(spark.sql("SELECT size(shingle_hashes('a b c', 2)) AS k")
      .head.getInt(0) == 2)
  }

  test("chunk_md5_hashes matches the composable md5-over-slice formulation") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf).limit(200)
      // exercise the split edge cases the byte-scan must reproduce:
      // consecutive/leading/trailing spaces (empty elements kept),
      // short docs, single token
      .select($"doc_id", $"text")
      .unionAll(Seq(
        (900001L, "A  b   c d e f g h i  "),
        (900002L, " x y z"),
        (900003L, "one"),
        (900004L, "a b c d e f g h"))
        .toDF("doc_id", "text"))
    val composable = docs
      .select($"doc_id", split(lower($"text"), " ").as("t"))
      .withColumn("n", size($"t")).filter($"n" >= 8)
      .select($"doc_id",
        explode(transform(sequence(lit(1), $"n" - 7),
          i => conv(substring(md5(concat_ws(" ", slice($"t", i, lit(8)))), 1, 15),
            16, 10).cast("long"))).as("h"))
      .groupBy($"doc_id").agg(collect_list($"h").as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaExpr = docs
      .select($"doc_id",
        explode(graft.functions.ChunkMd5Hashes.of($"text", 8)).as("h"))
      .groupBy($"doc_id").agg(collect_list($"h").as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr == composable)
    assert(docs.limit(1)
      .select(graft.functions.ChunkMd5Hashes.of(lit(null).cast("string"), 8))
      .head.isNullAt(0))
  }

  test("lsh_buckets matches the composable per-table CASE/arraydot formulation") {
    import spark.implicits._
    import graft.similarity.Similarity
    val emb = Tables.embeddings(spark, TestSpark.sf).limit(200)
      .select($"vec_id", $"embedding".as("__vec"))
    val dim = emb.select(size($"__vec")).head.getInt(0)
    val (planes, tables) = (4, 16)
    val composable = emb.select($"vec_id",
        explode(array((0 until tables).map(t => struct(lit(t).as("t"),
          Similarity.lshBucket($"__vec", planes, t, dim).as("b"))): _*)).as("tb"))
      .select($"vec_id", $"tb.t", $"tb.b")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val viaExpr = emb.select($"vec_id",
        posexplode(graft.functions.LshBuckets.of($"__vec", planes, tables))
          .as(Seq("t", "b")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(viaExpr == composable)
    // null embedding → null output
    assert(emb.limit(1).select(graft.functions.LshBuckets.of(
      lit(null).cast("array<float>"), planes, tables)).head.isNullAt(0))
  }

  test("jaro_winkler matches DuckDB's jaro_winkler_similarity byte-for-byte") {
    import spark.implicits._
    // expected values produced by DuckDB jaro_winkler_similarity /
    // jaro_similarity on these exact strings (round-12 probe). The
    // set covers transpositions, the 0.7 boost threshold (xy/xz has a
    // common prefix but j <= 0.7 → NO boost), empty strings, and a
    // multi-byte pair whose answer differs between byte and codepoint
    // semantics (0.70996 is the BYTE answer DuckDB gives).
    val vectors = Seq(
      ("martha", "marhta", 0.9611111111),
      ("dixon", "dicksonx", 0.8133333333),
      ("jellyfish", "smellyfish", 0.8962962963),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("a", "", 0.0),
      ("DUANE", "DWAYNE", 0.84),
      ("cat", "hat", 0.7777777778),
      ("prefix_aaaa", "prefix_zzzz", 0.8545454545),
      ("prefixAB", "prefiyXY", 0.85),
      ("aaaaaa", "bbbbbb", 0.0),
      ("ab", "ba", 0.0),
      ("aabbcc", "ccbbaa", 0.5555555556),
      ("xy", "xz", 0.6666666667),
      ("longercommonstart_123", "longercommonstart_987", 0.9428571429),
      ("Fußgänger", "Fussgaenger", 0.7679653680),
      ("ACME corp", "ACME Corp.", 0.9377777778),
      ("x", "x", 1.0))
    val got = vectors.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(graft.functions.JaroWinkler.of($"a", $"b"))
      .collect().map(_.getDouble(0))
    vectors.map(_._3).zip(got).zipWithIndex.foreach { case ((want, g), i) =>
      assert(math.abs(g - want) < 1e-9,
        s"${vectors(i)._1} / ${vectors(i)._2}: got $g want $want")
    }
    // null propagation + SQL registration
    assert(Seq(("a", "b")).toDF("a", "b")
      .select(graft.functions.JaroWinkler.of(lit(null).cast("string"), $"b"))
      .head.isNullAt(0))
    graft.functions.GraftFunctions.registerAll(spark)
    assert(spark.sql("SELECT jaro_winkler('martha', 'marhta') AS j")
      .head.getDouble(0) > 0.96)
  }

  test("nearest_cells matches the composable struct-min/sort formulation bitwise") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSpark.sf).limit(200)
      .select($"vec_id", $"embedding".as("__vec"))
    val cents = graft.similarity.KMeans.fit(
      Tables.embeddings(spark, TestSpark.sf), "vec_id", "embedding",
      k = 8, iters = 2)
    // the pre-round-12 formulation, rebuilt inline: -cosine against
    // typedlit centroids, struct-min for the cell, array_sort+slice
    // for the probes — the semantics NearestCells must reproduce
    def cos(vec: org.apache.spark.sql.Column, c: Seq[Double]) = {
      val dot = graft.functions.ArrayDot.dot _
      dot(vec, typedLit(c)) / sqrt(dot(vec, vec) * dot(typedLit(c), typedLit(c)))
    }
    val scored = cents.zipWithIndex.map { case (c, i) =>
      struct((-cos($"__vec", c)).as("negcos"), lit(i).as("cell"))
    }
    val composableCell = emb.select($"vec_id",
        array_min(array(scored: _*)).getField("cell").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaCell = emb.select($"vec_id",
        graft.similarity.KMeans.cellExpr($"__vec", cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaCell == composableCell)
    val composableProbe = emb.select($"vec_id",
        transform(slice(array_sort(array(scored: _*)), 1, 3),
          s => s.getField("cell")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val viaProbe = emb.select($"vec_id",
        graft.similarity.KMeans.probeExpr($"__vec", cents, 3).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(viaProbe == composableProbe)
  }

  test("array_pairs: ordered comb, strict variant, edge cases") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1L, 2L, 3L)),
      (2L, Seq(5L)),
      (3L, Seq.empty[Long]),
      (4L, Seq(7L, 7L, 9L))).toDF("id", "xs")
    val got = df.select($"id",
        graft.functions.ArrayPairs.of($"xs").as("ps"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getLong(0), p.getLong(1))))
      .toMap
    assert(got(1L) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got(2L) == Nil && got(3L) == Nil)
    // multiplicity kept in the plain variant
    assert(got(4L) == Seq((7L, 7L), (7L, 9L), (7L, 9L)))
    // strict drops the duplicate-equal pair, keeps both distinct combs
    val strict = df.filter($"id" === 4L).select(
        graft.functions.ArrayPairs.of($"xs", strict = true).as("ps"))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(p => (p.getLong(0), p.getLong(1)))
    assert(strict == Seq((7L, 9L), (7L, 9L)))
    // null array → null result
    assert(df.limit(1).select(graft.functions.ArrayPairs.of(
      lit(null).cast("array<bigint>"))).head.isNullAt(0))
  }

  test("fitMulti recovers exact coefficients on synthetic linear data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { _ =>
      val x1 = rnd.nextDouble() * 10; val x2 = rnd.nextDouble() * 5
      (x1, x2, 3.5 + 2.0 * x1 - 4.0 * x2)
    }
    val df = rows.toDF("x1", "x2", "y")
    val (b0, slopes) = graft.ml.LinearModel.fitMulti(df, Seq("x1", "x2"), "y")
    assert(math.abs(b0 - 3.5) < 1e-9)
    assert(math.abs(slopes.head - 2.0) < 1e-9)
    assert(math.abs(slopes(1) + 4.0) < 1e-9)
  }
}
