package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** §2.9 — sources/sinks: schema'd csv/json round-trips, partitioned
  * parquet writes with partition pruning, scan pushdown. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv round-trip with explicit schema") {
    val dir = tmp("graft-csv")
    val cust = Tables.customer(spark, TestSpark.sf)
    cust.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.count() == cust.count())
    assert(math.abs(back.agg(sum("c_acctbal")).head.getDouble(0) -
      cust.agg(sum("c_acctbal")).head.getDouble(0)) <= 1e-4)
  }

  test("json round-trip with explicit schema") {
    val dir = tmp("graft-json")
    val nation = Tables.nation(spark, TestSpark.sf)
    nation.write.mode("overwrite").json(dir)
    val back = spark.read.schema(nation.schema).json(dir)
    assert(back.count() == nation.count())
    assert(back.select("n_name").collect().map(_.getString(0)).sorted.toSeq ==
      nation.select("n_name").collect().map(_.getString(0)).sorted.toSeq)
  }

  test("orc round-trip preserves rows and aggregates") {
    val dir = tmp("graft-orc")
    val orders = Tables.orders(spark, TestSpark.sf)
    orders.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == orders.count())
    assert(math.abs(back.agg(sum("o_totalprice")).head.getDouble(0) -
      orders.agg(sum("o_totalprice")).head.getDouble(0)) <= 1e-4)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp("graft-part")
    val orders = Tables.orders(spark, TestSpark.sf)
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("o_year") === 1996)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition pruning:\n$plan")
    assert(back.count() ==
      orders.filter(col("o_year") === 1996).count())
  }

  test("xml round-trip preserves rows and aggregates (Spark 4 native source)") {
    val dir = tmp("graft-xml")
    val nations = Tables.nation(spark, TestSpark.sf)
    nations.write.mode("overwrite")
      .option("rootTag", "nations").option("rowTag", "nation")
      .format("xml").save(dir)
    val back = spark.read.option("rowTag", "nation").format("xml").load(dir)
    assert(back.count() == nations.count())
    assert(back.select(sum("n_nationkey")).head.getLong(0) ==
      nations.select(sum("n_nationkey")).head.getLong(0))
  }

  test("malformed csv rows route to the corrupt-record column, not job failure") {
    val dir = tmp("graft-badcsv")
    Files.write(java.nio.file.Paths.get(dir, "data.csv"),
      "1,alpha,10.5\n2,beta,not_a_number\n3,gamma,7.25\nbroken row\n"
        .getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    try {
      assert(df.count() == 4)
      val bad = df.filter(col("_corrupt_record").isNotNull)
        .select("_corrupt_record").collect().map(_.getString(0)).toSet
      assert(bad == Set("2,beta,not_a_number", "broken row"))
      // clean rows aggregate normally
      assert(df.filter(col("_corrupt_record").isNull)
        .agg(sum("score")).head.getDouble(0) == 17.75)
    } finally df.unpersist()
  }

  test("parquet schema evolution merges old and new columns") {
    val dir = tmp("graft-evolve")
    spark.range(3).select(col("id"), lit("v1").as("tag"))
      .write.parquet(dir + "/batch=1")
    spark.range(3, 6).select(col("id"), lit("v2").as("tag"),
        (col("id") * 10).as("score"))
      .write.parquet(dir + "/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "tag", "score", "batch"))
    // old rows surface the new column as null
    assert(merged.filter(col("batch") === 1)
      .filter(col("score").isNotNull).count() == 0)
    assert(merged.filter(col("batch") === 2)
      .agg(sum("score")).head.getLong(0) == 120)
  }

  test("binaryFile source ingests raw files into the multimodal pipeline") {
    val dir = tmp("graft-bin")
    val payloads = Map("a.img" -> "payload-alpha-0123456789",
      "b.img" -> "payload-beta", "c.txt" -> "not-an-image")
    for ((name, content) <- payloads)
      Files.write(java.nio.file.Paths.get(dir, name), content.getBytes("UTF-8"))
    // pathGlobFilter prunes non-matching files at listing time — no
    // bytes of c.txt are ever read (the 100 TB media-lake filter).
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img").load(dir)
    assert(bin.columns.toSeq ==
      Seq("path", "modificationTime", "length", "content"))
    assert(bin.count() == 2)
    val media = bin.select(
      xxhash64(col("path")).as("media_id"),
      col("content").as("payload"),
      lit("image/fake").as("media_type"))
    val decoded = multimodal.Multimodal.decodeAvi(media)
      .select("payload_len").collect().map(_.getLong(0)).sorted
    assert(decoded.toSeq == payloads.filterKeys(_.endsWith(".img"))
      .values.map(_.length.toLong).toSeq.sorted)
  }

  test("Tables.events reads every ts encoding the corpus has shipped") {
    // Round 8 broke the loader when events.ts moved from int64-nanos
    // to TIMESTAMP: pin all three physical encodings through the one
    // type-branching loader so the next format drift fails HERE, not
    // in 27 driver queries.
    import spark.implicits._
    val micros = Seq(1705321496789000L, 1705321499000001L, 1705407896000000L)
    val rows = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }

    def loadVariant(writeTs: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Seq[Long] = {
      val dir = tmp("graft-events-enc")
      val base = rows.toDF("event_id", "us")
      writeTs(base).select($"event_id", $"ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      Tables.events(spark, dir)
        .select(unix_micros($"ts")).collect().map(_.getLong(0)).sorted.toSeq
    }

    val asLongNanos = loadVariant(_.withColumn("ts", $"us" * 1000L))
    val asNtz = loadVariant(_.withColumn("ts",
      timestamp_micros($"us").cast("timestamp_ntz")))
    val asLtz = loadVariant(_.withColumn("ts", timestamp_micros($"us")))

    assert(asLongNanos == micros.sorted)
    assert(asNtz == micros.sorted)
    assert(asLtz == micros.sorted)
  }

  test("Tables.orders normalizes o_orderdate to NTZ from every encoding") {
    import spark.implicits._
    val micros = Seq(1705321496000000L, 1705407896000000L)
    val rows = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }

    def loadVariant(writeTs: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): (String, Seq[Long]) = {
      val dir = tmp("graft-orders-enc")
      writeTs(rows.toDF("o_orderkey", "us"))
        .select($"o_orderkey", $"o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val back = Tables.orders(spark, dir)
      (back.schema("o_orderdate").dataType.simpleString,
        back.select(unix_micros($"o_orderdate".cast("timestamp")))
          .collect().map(_.getLong(0)).sorted.toSeq)
    }

    val variants = Seq(
      loadVariant(_.withColumn("o_orderdate", $"us" * 1000L)),
      loadVariant(_.withColumn("o_orderdate",
        timestamp_micros($"us").cast("timestamp_ntz"))),
      loadVariant(_.withColumn("o_orderdate", timestamp_micros($"us"))))
    for ((tpe, vals) <- variants) {
      assert(tpe == "timestamp_ntz", s"canonical type drifted: $tpe")
      assert(vals == micros.sorted)
    }
  }

  test("filters and projections push down to the parquet scan") {
    val df = Tables.lineitem(spark, TestSpark.sf)
      .filter(col("l_orderkey") < 100)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.contains("LessThan(l_orderkey,100)"),
      s"filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$scan")
  }

  test("jdbc round-trip with partitioned parallel read and filter pushdown") {
    // embedded Derby (bundled with Spark for the Hive metastore) as
    // the in-process database — the migrating-user JDBC path with no
    // external service. Avro stays uncovered: the `avro` DataFrame
    // source lives in the spark-avro connector jar, which this
    // zero-egress container does not bundle.
    val url = "jdbc:derby:" + sys.props("java.io.tmpdir") +
      "/graft_jdbc_db;create=true"
    val src = Tables.nation(spark, TestSpark.sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    src.write.mode("overwrite")
      .format("jdbc").option("url", url).option("dbtable", "nation")
      .save()
    // partitioned read: 4 concurrent range-bounded queries
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "nation")
      .option("partitionColumn", "n_nationkey")
      .option("lowerBound", "0").option("upperBound", "25")
      .option("numPartitions", "4")
      .load()
    assert(back.rdd.getNumPartitions == 4, "read not range-partitioned")
    assert(back.count() == src.count())
    assert(back.orderBy("n_nationkey").collect().map(_.toString).toSeq ==
      src.orderBy("n_nationkey").collect().map(_.toString).toSeq)
    // predicates reach the database, not the Spark filter operator
    val filtered = back.filter(col("n_regionkey") === 1)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("n_regionkey"),
      s"filter not pushed to JDBC:\n$p")
    assert(filtered.count() ==
      src.filter(col("n_regionkey") === 1).count())
  }
}
