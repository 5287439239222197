package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Arrow IPC DataSource V2: typed round-trip with nulls, overwrite vs
  * append semantics, schema inference, one-partition-per-file read
  * parallelism, and vector-level column pruning. */
class ArrowSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val fmt = "graft.sources.ArrowSource"

  private def tmp(): String =
    Files.createTempDirectory("graft_arrow").toString

  private def sample() = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("n", IntegerType),
      StructField("x", DoubleType),
      StructField("ok", BooleanType),
      StructField("s", StringType),
      StructField("ts", TimestampType)))
    val rows = (0 until 1000).map { i =>
      Row(
        i.toLong,
        if (i % 7 == 0) null else Int.box(i * 3),
        if (i % 11 == 0) null else Double.box(i * 0.25),
        Boolean.box(i % 2 == 0),
        if (i % 5 == 0) null else s"row-$i-é中",
        Timestamp.valueOf(s"2024-01-0${i % 9 + 1} 12:00:0${i % 10}"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
  }

  test("round-trip preserves every supported type, nulls included") {
    val dir = tmp()
    val df = sample()
    df.write.format(fmt).mode("append").save(dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    val a = df.collect().map(_.toString).sorted
    val b = back.collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("one .arrow file per task; read plans one partition per file") {
    val dir = tmp()
    sample().repartition(4).write.format(fmt).mode("append").save(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".arrow"))
    assert(files.length === 4)
    val back = spark.read.format(fmt).load(dir)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === 1000)
  }

  test("overwrite replaces, append accumulates") {
    import spark.implicits._
    val dir = tmp()
    val d1 = (1 to 10).toDF("id").select($"id".cast("long"))
    val d2 = (11 to 15).toDF("id").select($"id".cast("long"))
    d1.write.format(fmt).mode("append").save(dir)
    d2.write.format(fmt).mode("append").save(dir)
    assert(spark.read.format(fmt).load(dir).count() === 15)
    d2.write.format(fmt).mode("overwrite").save(dir)
    val left = spark.read.format(fmt).load(dir)
    assert(left.count() === 5)
    assert(left.as[Long].collect().sorted.toSeq === (11L to 15L))
  }

  test("projection reaches the scan's read schema") {
    val dir = tmp()
    sample().write.format(fmt).mode("append").save(dir)
    val pruned = spark.read.format(fmt).load(dir).select("id", "s")
    val scanLine = pruned.queryExecution.executedPlan.toString()
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("ReadSchema") || scanLine.nonEmpty)
    // the DSv2 scan's readSchema must have shrunk to the projection
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("id", "s"))
    assert(pruned.count() === 1000)
  }

  test("empty partitions write valid (possibly empty) files; read survives") {
    import spark.implicits._
    val dir = tmp()
    // 8 partitions over 3 rows: most tasks see zero rows
    (1 to 3).toDF("id").select($"id".cast("long"))
      .repartition(8).write.format(fmt).mode("append").save(dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("foreachBatch streaming into arrow files is readable per epoch") {
    import spark.implicits._
    val dir = tmp()
    val q = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", 16L).option("numPartitions", 2L)
      .option("startTimestamp", 0L).option("advanceMillisPerBatch", 1000L)
      .load()
      .select($"value")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_arrow_ck").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.format(fmt).mode("append").save(dir); ()
      }.start()
    try {
      val deadline = System.nanoTime() + 90L * 1000000000L
      def count(): Long =
        try spark.read.format(fmt).load(dir).count() catch {
          case _: IllegalArgumentException => 0L // no files yet
        }
      while (count() < 48 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(count() >= 48, "stream wrote fewer than 3 epochs")
    } finally q.stop()
    // offsets are gap-free from zero across all epochs written
    val vals = spark.read.format(fmt).load(dir).as[Long].collect().sorted
    assert(vals.toSeq == (0L until vals.length))
  }

  test("schema drift across files fails with a named mismatch, not an NPE") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1).write.format(fmt).mode("append").save(dir)
    // an append whose schema drifted: column renamed and retyped
    Seq((3, 1.5)).toDF("id2", "x")
      .coalesce(1).write.format(fmt).mode("append").save(dir)
    val err = intercept[org.apache.spark.SparkException] {
      spark.read.format(fmt).load(dir).collect()
    }
    val msg = Iterator.iterate[Throwable](err)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msg.contains("lacks column") || msg.contains("expected"),
      s"wanted a descriptive schema-mismatch error, got: $msg")
  }

  test("aggregate over an arrow round-trip of a real table matches parquet") {
    val dir = tmp()
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast("double").as("p"))
    orders.write.format(fmt).mode("append").save(dir)
    val viaArrow = spark.read.format(fmt).load(dir)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"),
        round(sum(col("p")), 4).as("total"))
      .collect().map(_.toString).sorted.toSeq
    val direct = orders
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"),
        round(sum(col("p")), 4).as("total"))
      .collect().map(_.toString).sorted.toSeq
    assert(viaArrow === direct)
  }
}
