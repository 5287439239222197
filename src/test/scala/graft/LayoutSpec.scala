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

  test("z-order write gives both columns file-skipping power") {
    import spark.implicits._
    val dir = tmp("graft-zorder")
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select($"l_orderkey", $"l_partkey", $"l_extendedprice")
    Layout.writeZOrdered(li, "l_orderkey", "l_partkey", 8, dir)

    val parts = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
    assert(parts.length == 8)
    assert(spark.read.parquet(dir).count() == li.count())

    // per-file [min,max] of each dimension = what footer stats prune on
    def ranges(c: String) = parts.map { f =>
      val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head
      (r.getLong(0), r.getLong(1))
    }
    // a ~5%-span predicate must intersect strictly fewer files than a
    // full scan — on BOTH columns. The band sits at the 10-15%
    // quantiles, INSIDE the curve's top-bit cells: an 8-file Morton
    // split fixes a's top 2 bits and b's top bit (expected hits ~2/8
    // and ~4/8), but any band straddling a cell boundary — the median
    // straddles both top bits — legitimately touches all cells.
    def hits(c: String): Int = {
      val Array(lo, hi) = li.stat.approxQuantile(c, Array(0.10, 0.15), 0.0)
      ranges(c).count { case (mn, mx) => mx >= lo && mn <= hi }
    }
    val (ha, hb) = (hits("l_orderkey"), hits("l_partkey"))
    info(s"narrow-predicate file hits: l_orderkey=$ha/8, l_partkey=$hb/8")
    assert(ha <= 4, s"z-order lost skipping on l_orderkey: $ha of 8 files")
    assert(hb <= 6, s"z-order lost skipping on l_partkey: $hb of 8 files")
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
