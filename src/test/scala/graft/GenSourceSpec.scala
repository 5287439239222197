package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom DSv2 connector: partition-parallel, deterministic,
  * column-pruning. */
class GenSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def gen(rows: Long, parts: Int) =
    spark.read.format("graft.sources.GenSource")
      .option("rows", rows).option("partitions", parts)
      .option("buckets", 16).load()

  test("generates exactly the requested rows across the requested partitions") {
    val df = gen(10000, 8)
    assert(df.count() == 10000)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.schema.fieldNames.toSeq == Seq("id", "bucket", "val"))
  }

  test("ids are a complete range and values deterministic across reads") {
    val df = gen(5000, 4)
    assert(df.agg(countDistinct(col("id"))).collect().head.getLong(0) == 5000)
    assert(df.agg(min(col("id")), max(col("id"))).collect().head
      .toSeq == Seq(0L, 4999L))
    val a = df.orderBy("id").collect().map(_.toSeq)
    val b = gen(5000, 4).orderBy("id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("column pruning reaches the reader") {
    val df = gen(1000, 2).select("bucket")
    assert(df.schema.fieldNames.toSeq == Seq("bucket"))
    // pruned scan schema shows in the plan: only `bucket` read
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("bucket") && !p.contains("ReadSchema: struct<id"),
      s"projection not pushed into the DSv2 scan:\n${p.take(1500)}")
    val counts = df.groupBy("bucket").count().collect()
    assert(counts.length == 16)
  }

  test("buckets and vals are well-distributed") {
    val df = gen(16000, 4)
    val per = df.groupBy("bucket").count().collect()
      .map(_.getLong(1))
    assert(per.length == 16)
    assert(per.forall(c => c > 600 && c < 1400)) // ~1000 each
    val mv = df.agg(avg(col("val"))).collect().head.getDouble(0)
    assert(mv > 0.45 && mv < 0.55)
  }
}
