package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.AvroCodec
import graft.multimodal.AvroCodec.{AvroField, AvroFormatException}

/** The from-scratch Avro object-container codec and its DSv2
  * connector: typed round-trip with nulls, deflate blocks, schema
  * JSON round-trip (unions + logical types), per-file read
  * parallelism, decode-boundary column pruning, per-file schema
  * validation, and the fuzz contract (arbitrary bytes reject with
  * AvroFormatException, never an obscure failure). */
class AvroSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val fmt = "graft.sources.AvroSource"

  private def tmp(): String =
    Files.createTempDirectory("graft_avro").toString

  private def sample() = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", IntegerType),
      StructField("x", DoubleType),
      StructField("f", FloatType),
      StructField("ok", BooleanType),
      StructField("s", StringType),
      StructField("b", BinaryType),
      StructField("ts", TimestampType)))
    val rows = (0 until 1000).map { i =>
      Row(
        i.toLong,
        if (i % 7 == 0) null else Int.box(i * 3),
        if (i % 11 == 0) null else Double.box(i * 0.25),
        if (i % 13 == 0) null else Float.box(i * 0.5f),
        Boolean.box(i % 2 == 0),
        if (i % 5 == 0) null else s"row-$i-é中\n\"quoted\"",
        if (i % 3 == 0) null else Array[Byte](i.toByte, (i >> 8).toByte, 0, -1),
        Timestamp.valueOf(s"2024-01-0${i % 9 + 1} 12:00:0${i % 10}"))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  test("schema JSON round-trips unions and logical types") {
    val fields = Seq(
      AvroField("a", "long", nullable = false),
      AvroField("b", "string", nullable = true),
      AvroField("t", "long", nullable = true, Some("timestamp-micros")),
      AvroField("z", "bytes", nullable = false))
    assert(AvroCodec.parseSchema(AvroCodec.schemaJson(fields)) === fields)
    // foreign spellings: whitespace, reordered union, extra attrs
    val foreign =
      """{ "type": "record", "name": "r", "doc": "x", "fields": [
        |  { "name": "a", "type": ["string", "null"], "doc": "d" },
        |  { "name": "t", "type": { "type": "long",
        |      "logicalType": "timestamp-micros" } } ] }""".stripMargin
    assert(AvroCodec.parseSchema(foreign) === Seq(
      AvroField("a", "string", nullable = true),
      AvroField("t", "long", nullable = false, Some("timestamp-micros"))))
  }

  test("round-trip preserves every supported type, nulls included") {
    val dir = tmp()
    val df = sample()
    df.write.format(fmt).mode("append").save(dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    def key(r: Row) = r.toSeq.map {
      case b: Array[Byte] => b.toSeq.toString
      case v => String.valueOf(v)
    }.mkString("|")
    assert(back.collect().map(key).sorted.toSeq ===
      df.collect().map(key).sorted.toSeq)
  }

  test("deflate codec: smaller files, identical content") {
    import spark.implicits._
    val plainDir = tmp(); val deflDir = tmp()
    val df = (0 until 5000)
      .map(i => (i.toLong, s"the quick brown fox $i jumps " * 3))
      .toDF("id", "s").coalesce(1)
    df.write.format(fmt).mode("append").save(plainDir)
    df.write.format(fmt).option("codec", "deflate")
      .mode("append").save(deflDir)
    def size(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".avro")).map(_.length).sum
    assert(size(deflDir) < size(plainDir) / 2,
      s"deflate ${size(deflDir)} not < half of plain ${size(plainDir)}")
    assert(spark.read.format(fmt).load(deflDir).collect().map(_.toString).sorted
      .toSeq === df.collect().map(_.toString).sorted.toSeq)
  }

  test("one container per task; read plans one partition per file") {
    val dir = tmp()
    sample().repartition(4).write.format(fmt).mode("append").save(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".avro"))
    assert(files.length === 4)
    val back = spark.read.format(fmt).load(dir)
    assert(back.rdd.getNumPartitions === 4)
  }

  test("projection reaches the decode boundary (pruned read schema)") {
    val dir = tmp()
    sample().write.format(fmt).mode("append").save(dir)
    val projected = spark.read.format(fmt).load(dir).select("id", "s")
    val scans = projected.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("id", "s"))
    assert(projected.count() === 1000)
  }

  test("overwrite replaces, append accumulates") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a")).toDF("id", "s").write.format(fmt).mode("append").save(dir)
    Seq((2L, "b")).toDF("id", "s").write.format(fmt).mode("append").save(dir)
    assert(spark.read.format(fmt).load(dir).count() === 2)
    Seq((9L, "z")).toDF("id", "s").write.format(fmt)
      .mode("overwrite").save(dir)
    val rows = spark.read.format(fmt).load(dir).collect()
    assert(rows.length === 1 && rows.head.getLong(0) === 9L)
  }

  test("array columns (embeddings) round-trip, empty and null included") {
    import spark.implicits._
    val dir = tmp()
    // the real embeddings table (Array[Float]) plus edge rows
    val emb = Tables.embeddings(spark, TestSpark.sf)
      .select($"vec_id", $"embedding")
    val edge = Seq(
      (-1L, Some(Array.empty[Float])),
      (-2L, None)).toDF("vec_id", "embedding")
    emb.unionByName(edge).write.format(fmt)
      .option("codec", "deflate").mode("append").save(dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.schema("embedding").dataType ===
      ArrayType(FloatType, containsNull = false))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        val a = if (r.isNullAt(1)) "null"
          else r.getSeq[Float](1).mkString(",")
        s"${r.getLong(0)}|$a"
      }.sorted.toSeq
    assert(key(back) === key(emb.unionByName(edge)))
    // and the arrays are usable by the HOF similarity machinery
    val dots = back.filter($"vec_id" >= 0)
      .select(graft.functions.ArrayDot.dot($"embedding", $"embedding").as("d"))
      .agg(org.apache.spark.sql.functions.sum($"d")).head.getDouble(0)
    assert(dots > 0.0)
  }

  test("schema drift across files fails with a named mismatch") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a")).toDF("id", "s")
      .coalesce(1).write.format(fmt).mode("append").save(dir)
    Seq((2, 1.5)).toDF("id2", "x")
      .coalesce(1).write.format(fmt).mode("append").save(dir)
    val err = intercept[org.apache.spark.SparkException] {
      spark.read.format(fmt).load(dir).collect()
    }
    val msg = Iterator.iterate[Throwable](err)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msg.contains("lacks column") || msg.contains("expected"),
      s"wanted a descriptive schema-mismatch error, got: $msg")
  }

  test("fuzz: arbitrary and truncated bytes reject, never throw obscurely") {
    // a valid container to truncate/corrupt — includes an array
    // field so the blocked-array decode loop is inside the fuzz net
    val fields = Seq(AvroField("id", "long", false),
      AvroField("s", "string", true),
      AvroField("v", "array", true, items = Some("float")))
    val buf = new java.io.ByteArrayOutputStream()
    val w = new AvroCodec.Writer(buf, fields, "deflate", blockRows = 16)
    (0 until 100).foreach(i =>
      w.write(Array[Any](i.toLong,
        if (i % 3 == 0) null else s"v$i",
        if (i % 5 == 0) null else Array.tabulate(i % 7)(_.toFloat))))
    w.finish()
    val valid = buf.toByteArray
    assert(AvroCodec.readRows(valid, Seq(0, 1, 2)).size === 100)

    val rnd = new scala.util.Random(1234)
    def attempt(bytes: Array[Byte]): Unit =
      try AvroCodec.readRows(bytes, Seq(0, 1, 2)).foreach(_ => ())
      catch {
        case _: AvroFormatException => // the contract
        case t: Throwable => fail(
          s"non-contract failure ${t.getClass.getName}: ${t.getMessage}")
      }
    // truncations at every prefix length band
    (1 until valid.length by 7).foreach(n => attempt(valid.take(n)))
    // random corruptions of single bytes
    (0 until 300).foreach { _ =>
      val b = valid.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      attempt(b)
    }
    // pure noise
    (0 until 200).foreach { _ =>
      attempt(Array.fill(rnd.nextInt(400))(rnd.nextInt(256).toByte))
    }
  }
}
