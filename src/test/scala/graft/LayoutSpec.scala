package graft

import java.nio.file.{Files, Paths}
import graft.sources.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("range-sorted write produces disjoint per-file key ranges") {
    import spark.implicits._
    val dir = tmp("graft-range")
    val orders = Tables.orders(spark, TestSpark.sf)
    Layout.writeRangeSorted(orders, "o_orderdate", 4, dir)

    val parts = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
    assert(parts.length == 4)
    // per-file [min,max] ranges must not overlap → footer stats can
    // eliminate whole files for any range predicate
    val ranges = parts.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(unix_seconds($"o_orderdate".cast("timestamp"))),
          max(unix_seconds($"o_orderdate".cast("timestamp")))).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    for (Array(a, b) <- ranges.sliding(2).map(_.toArray))
      assert(a._2 <= b._1, s"file ranges overlap: $a vs $b")
    // nothing lost
    assert(spark.read.parquet(dir).count() == orders.count())
  }

  test("compaction reduces file count and preserves rows") {
    val dir = tmp("graft-small")
    val out = tmp("graft-compact")
    val orders = Tables.orders(spark, TestSpark.sf)
    orders.repartition(16).write.mode("overwrite").parquet(dir)
    Layout.compact(spark, dir, 2, out)
    val outFiles = Files.list(Paths.get(out)).toArray.map(_.toString)
      .count(_.endsWith(".parquet"))
    assert(outFiles == 2)
    assert(spark.read.parquet(out).count() == orders.count())
  }
}
