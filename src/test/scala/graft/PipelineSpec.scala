package graft

import graft.pipeline._
import graft.quality.{ExpectBetween, ExpectNotNull, ExpectationSuite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("generator instantiates one lazy pipeline per dataset config") {
    val segs = Seq("BUILDING", "MACHINERY", "AUTOMOBILE")
    val configs = segs.map { seg =>
      DatasetConfig(seg, sp => Tables.customer(sp, TestSpark.sf)
        .filter(col("c_mktsegment") === seg))
    }
    val suite = ExpectationSuite("customer",
      Seq(ExpectBetween("c_acctbal", -1000, 10000)))
    val results = PipelineGenerator.generate(spark, configs, _ =>
      Pipeline("clean", Seq(
        Pipeline.validateStage(suite),
        Stage("project")(_.select("c_custkey", "c_acctbal")))))
    assert(results.keySet == segs.toSet)
    results.values.foreach { df =>
      assert(df.columns.toSeq == Seq("c_custkey", "c_acctbal"))
      assert(df.count() > 0)
    }
  }

  test("validate stage quarantines out-of-range rows") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, 99999.0)).toDF("id", "x")
    val suite = ExpectationSuite("t", Seq(ExpectBetween("x", 0, 100)))
    val cleaned = Pipeline("p", Seq(Pipeline.validateStage(suite))).run(df)
    assert(cleaned.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("gated pipeline routes validation failures per stage policy") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, 99999.0), (3L, 50.0), (4L, -7.0))
      .toDF("id", "x")
    val suite = ExpectationSuite("t", Seq(ExpectBetween("x", 0, 100)))
    val pipe = Pipeline("p", Seq(
      Stage("clean")(identity),
      Stage("double")(_.withColumn("x2", $"x" * 2))))

    // Quarantine: bad rows split off, stage proceeds on clean rows
    val (out, q) = GatedPipeline(pipe,
      Map("clean" -> (suite, Pipeline.Quarantine))).run(df)
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(q.map(_._1) == Seq("clean"))
    assert(q.head._2.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))

    // Continue: violations pass through (observe-only policy)
    val (outC, qC) = GatedPipeline(pipe,
      Map("clean" -> (suite, Pipeline.Continue))).run(df)
    assert(outC.count() == 4)
    assert(qC.isEmpty)

    // FailFast: the ACTION fails when a violating row is hit
    val (outF, _) = GatedPipeline(pipe,
      Map("clean" -> (suite, Pipeline.FailFast))).run(df)
    val e = intercept[Exception] {
      outF.write.format("noop").mode("overwrite").save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dq violation")))
    // and a clean input passes untouched
    val (okF, _) = GatedPipeline(pipe,
      Map("clean" -> (suite, Pipeline.FailFast)))
      .run(df.filter($"x" >= 0 && $"x" <= 100))
    assert(okF.count() == 2)
  }

  test("gate failure emits an operator-facing alert record") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, 99999.0), (3L, 50.0), (4L, -7.0))
      .toDF("id", "x")
    val suite = ExpectationSuite("t", Seq(
      ExpectBetween("x", 0, 100),    // 2 violations → fails
      ExpectNotNull("id")))          // passes → no alert
    val pipe = Pipeline("p", Seq(
      Stage("clean")(identity),
      Stage("double")(_.withColumn("x2", $"x" * 2))))
    val gated = GatedPipeline(pipe,
      Map("clean" -> (suite, Pipeline.Quarantine)))

    val alerts = gated.alerts(df).collect()
    // exactly the failing expectation alerts, with routing context
    assert(alerts.length == 1)
    val a = alerts.head
    assert(a.getAs[String]("pipeline") == "p")
    assert(a.getAs[String]("stage") == "clean")
    assert(a.getAs[String]("exp_name") == "expect_between")
    assert(a.getAs[String]("col_name") == "x")
    assert(a.getAs[String]("policy") == "Quarantine")
    assert(a.getAs[Double]("observed") == 2.0) // both violations counted

    // all-green input → empty alert frame, same schema
    val clean = gated.alerts(df.filter($"x" >= 0 && $"x" <= 100))
    assert(clean.count() == 0)
    assert(clean.columns.toSeq == Seq("pipeline", "stage", "table_name",
      "exp_name", "col_name", "policy", "observed"))

    // ungated pipeline → empty alert frame with the same schema
    val none = GatedPipeline(pipe, Map.empty).alerts(df)
    assert(none.count() == 0)
    assert(none.columns.toSeq == clean.columns.toSeq)
  }

  test("observed pipeline reports per-stage row counts with one action") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pipe = Pipeline("obs", Seq(
      Stage("filter")(_.filter($"o_totalprice" > 50000)),
      Stage("project")(_.select($"o_custkey", $"o_totalprice"))))
    val (out, metrics) = pipe.runObserved(Tables.orders(spark, TestSpark.sf))
    out.write.format("noop").mode("overwrite").save()
    val counts = metrics.map { case (n, o) => n -> o.get("rows") }.toMap
    val expected = Tables.orders(spark, TestSpark.sf)
      .filter($"o_totalprice" > 50000).count()
    assert(counts("filter") == expected)
    assert(counts("project") == expected)
    assert(expected > 0)
  }

  test("multimodal video decode parses real AVI containers") {
    import spark.implicits._
    val decoded = graft.multimodal.Multimodal.decodeAvi(
      graft.multimodal.Multimodal.withAviPayload(
        Tables.documents(spark, TestSpark.sf), "doc_id"))
    val row = decoded.filter($"media_id" === 5L).head()
    val (w, h, n) = graft.multimodal.AviCodec.dims(5L)
    assert(row.getAs[Long]("width") == w)
    assert(row.getAs[Long]("height") == h)
    assert(row.getAs[Long]("n_frames") == n)
    // parsed offsets are the writer's fixed layout: 232 + f·(w·h·3+8)
    val offs = row.getAs[scala.collection.Seq[Long]]("frame_offsets")
    assert(offs.toSeq ==
      (0 until n).map(f => 232L + f.toLong * (w * h * 3 + 8)))
    // frames explode to exactly sum(n_frames)
    val frames = graft.multimodal.Multimodal.sampleFrames(decoded)
    val expected = decoded.agg(sum("n_frames")).head.getLong(0)
    assert(frames.count() == expected)
    // unparseable payloads quarantine to null features, keep length
    val junk = graft.multimodal.Multimodal.decodeAvi(
      graft.multimodal.Multimodal.withFakePayload(
        Tables.documents(spark, TestSpark.sf), "doc_id", "text"))
    assert(junk.filter($"n_frames".isNull).count() == junk.count())
    assert(junk.filter($"payload_len" > 0).count() == junk.count())
  }

  test("AviCodec round-trips real RIFF/AVI bytes and rejects malformed input") {
    import graft.multimodal.AviCodec
    val id = 9876L
    val bytes = AviCodec.render(id)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "AVI ")
    val Some((w, h, n, sums, offs)) = AviCodec.parse(bytes)
    val (ew, eh, en) = AviCodec.dims(id)
    assert((w, h, n) == ((ew, eh, en)))
    // per-frame sums match the closed form byte-for-byte
    val fsz = w * h * 3
    sums.zipWithIndex.foreach { case (s, f) =>
      val expected = (0 until fsz).map(j =>
        math.floorMod(id + 31L * f + j, 256)).sum
      assert(s == expected, s"frame $f sum")
    }
    // offsets really address the frame bytes in the payload
    offs.zipWithIndex.foreach { case (o, f) =>
      assert((bytes(o.toInt) & 0xff) == math.floorMod(id + 31L * f, 256))
    }
    // rejects: null, truncation, bad magic, frame-size mismatch
    assert(AviCodec.parse(null).isEmpty)
    assert(AviCodec.parse(bytes.take(bytes.length - 3)).isEmpty)
    assert(AviCodec.parse(Array[Byte](1, 2, 3)).isEmpty)
    val badMagic = bytes.clone(); badMagic(9) = 'X'.toByte
    assert(AviCodec.parse(badMagic).isEmpty)
    // corrupt the avih width: header/frame cross-validation must fail
    val badWidth = bytes.clone(); badWidth(24 + 8 + 32) = 1; badWidth(24 + 8 + 33) = 0
    assert(AviCodec.parse(badWidth).isEmpty)
    // fuzz: random byte flips never crash, only parse or reject
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val mut = bytes.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      AviCodec.parse(mut) // must not throw
    }
    (1 to 50).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(500))(rnd.nextInt(256).toByte)
      AviCodec.parse(junk) // must not throw
    }
  }

  test("PpmCodec round-trips real P6 bytes and rejects malformed input") {
    import graft.multimodal.PpmCodec
    // render → parse recovers the closed-form dims and channel sums
    val id = 12345L
    val bytes = PpmCodec.render(id)
    assert(new String(bytes.take(2), "US-ASCII") == "P6")
    val Some((w, h, sr, sg, sb)) = PpmCodec.parse(bytes)
    assert(w == (id % 64 + 8).toInt && h == (id % 48 + 6).toInt)
    val s = (id % 256).toInt
    def sum(c: Int) = (0 until w * h).map(k => (s + 3 * k + c) % 256).map(_.toLong).sum
    assert((sr, sg, sb) == ((sum(0), sum(1), sum(2))))
    // header comments are legal netpbm even though render never emits them
    val commented = ("P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII")
      ++ Array[Byte](10, 20, 30, 40, 50, 60))
    assert(PpmCodec.parse(commented) == Some((2, 1, 50L, 70L, 90L)))
    // malformed: wrong magic, truncated raster, maxval > 255, null
    assert(PpmCodec.parse("P5\n2 1\n255\n??????".getBytes).isEmpty)
    assert(PpmCodec.parse(bytes.dropRight(1)).isEmpty)
    assert(PpmCodec.parse("P6\n1 1\n65535\nxxxxxx".getBytes).isEmpty)
    assert(PpmCodec.parse(null).isEmpty)
  }

  test("dhash56 is a 56-bit hash from the parsed raster, null-safe on junk") {
    import graft.multimodal.PpmCodec
    val id = 54321L
    val Some(h) = PpmCodec.dhash56(PpmCodec.render(id))
    assert((h >>> 56) === 0L, "must fit in 56 bits (non-negative BIGINT)")
    // independent recompute from the closed form the oracle uses
    val w = (id % 64 + 8).toInt; val ht = (id % 48 + 6).toInt
    val s = (id % 256).toInt
    def g(x: Int, y: Int): Int = {
      val k = (y * ht / 8) * w + (x * w / 8)
      (s + 3 * k) % 256 + (s + 3 * k + 1) % 256 + (s + 3 * k + 2) % 256
    }
    var expect = 0L
    for (y <- 0 until 8; x <- 0 until 7)
      if (g(x + 1, y) > g(x, y)) expect |= 1L << (y * 7 + x)
    assert(h === expect)
    // a constant-color raster hashes to 0 (no positive differences)
    val flat = ("P6\n8 8\n255\n".getBytes("US-ASCII")
      ++ Array.fill[Byte](8 * 8 * 3)(77))
    assert(PpmCodec.dhash56(flat) === Some(0L))
    assert(PpmCodec.dhash56(null).isEmpty)
    assert(PpmCodec.dhash56("P5\njunk".getBytes).isEmpty)
  }

  test("afp56 is a 56-bit fingerprint from parsed samples, null-safe on junk") {
    import graft.multimodal.WavCodec
    val id = 24680L
    val Some(fp) = WavCodec.afp56(WavCodec.render(id))
    assert((fp >>> 56) === 0L, "must fit in 56 bits")
    // independent recompute from the closed form the oracle uses
    val n = (id % 384 + 64).toInt
    val energy = new Array[Long](57)
    for (k <- 0 until n) {
      val v = math.floorMod(id * 7 + 13L * k, 4096) - 2048
      energy(k * 57 / n) += v * v
    }
    var expect = 0L
    for (w <- 0 until 56) if (energy(w + 1) > energy(w)) expect |= 1L << w
    assert(fp === expect)
    // too few frames for 57 windows -> None, not a crash
    val tiny = {
      val b = WavCodec.render(0L) // n = 64 frames; truncate data to 40
      val cut = java.util.Arrays.copyOf(b, 44 + 40 * 4)
      // fix the RIFF and data sizes for the truncated body
      def putU32(off: Int, v: Int): Unit = {
        cut(off) = (v & 0xff).toByte; cut(off + 1) = ((v >>> 8) & 0xff).toByte
        cut(off + 2) = ((v >>> 16) & 0xff).toByte
        cut(off + 3) = ((v >>> 24) & 0xff).toByte
      }
      putU32(4, 36 + 40 * 4); putU32(40, 40 * 4)
      cut
    }
    assert(WavCodec.afp56(tiny).isEmpty)
    assert(WavCodec.afp56(null).isEmpty)
    assert(WavCodec.afp56("RIFFjunk".getBytes).isEmpty)
  }

  test("WavCodec round-trips real RIFF/PCM16 bytes and rejects malformed input") {
    import graft.multimodal.WavCodec
    val id = 98765L
    val bytes = WavCodec.render(id)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val Some((nch, rate, frames, s0, s1, peak)) = WavCodec.parse(bytes)
    val n = (id % 384 + 64).toInt
    assert(nch == 2 && rate == 8000 && frames == n)
    def ch(c: Int) = (0 until n).map(k =>
      math.floorMod(id * 7 + 13L * k + 5L * c, 4096) - 2048)
    assert(s0 == ch(0).sum && s1 == ch(1).sum)
    assert(peak == (ch(0) ++ ch(1)).map(math.abs).max)
    // an unknown chunk between fmt and data is skipped, not fatal
    val withJunk = bytes.slice(0, 36) ++
      "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "info".getBytes ++
      bytes.drop(36)
    // RIFF size field is stale after splice but parse never checks it
    assert(WavCodec.parse(withJunk) == WavCodec.parse(bytes))
    // malformed: wrong magic, truncated data, 24-bit, float PCM, null
    assert(WavCodec.parse("RIFX1234WAVE".getBytes ++ bytes.drop(12)).isEmpty)
    assert(WavCodec.parse(bytes.dropRight(1)).isEmpty)
    val b24 = bytes.clone(); b24(34) = 24
    assert(WavCodec.parse(b24).isEmpty)
    val bf = bytes.clone(); bf(20) = 3 // IEEE float format tag
    assert(WavCodec.parse(bf).isEmpty)
    assert(WavCodec.parse(null).isEmpty)
  }

  test("decodePpm parses payload bytes distributed and nulls unparseable rows") {
    import spark.implicits._
    val media = graft.multimodal.Multimodal.withPpmPayload(
      Tables.documents(spark, TestSpark.sf).limit(50), "doc_id")
    val decoded = graft.multimodal.Multimodal.decodePpm(media)
    val row = decoded.filter($"media_id" === 7L).head()
    assert(row.getAs[Long]("width") == 7 % 64 + 8)
    assert(row.getAs[Long]("height") == 7 % 48 + 6)
    assert(row.getAs[Long]("n_px") ==
      row.getAs[Long]("width") * row.getAs[Long]("height"))
    // a corrupted payload flows through as null features, not a crash
    val bad = media.withColumn("payload",
      when($"media_id" === 7L, lit("not a ppm".getBytes))
        .otherwise($"payload"))
    val badRow = graft.multimodal.Multimodal.decodePpm(bad)
      .filter($"media_id" === 7L).head()
    assert(badRow.isNullAt(badRow.fieldIndex("width")))
  }
}
