package graft

import graft.operators.Rank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Rank.runningSums]] must agree exactly with the naive
  * single-task `Window.orderBy` it replaces — including RANGE-frame
  * peer semantics on ties — for every bucket count, and
  * [[Rank.ntileOf]] must reproduce Spark's NTILE row-position
  * assignment for uneven splits. */
class RankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = {
    // deterministic pseudo-random values with plenty of ties
    val data = (1 to 500).map { i =>
      val g = "g" + (i % 3)
      val v = (i * 37 % 25).toDouble
      (g, i.toLong, v, (i % 7 + 1).toLong)
    }
    data.toDF("g", "id", "v", "w")
  }

  test("global running sum with ties matches unpartitioned window") {
    val naive = rows
      .withColumn("cum", sum($"w").over(Window.orderBy($"v")))
      .withColumn("tot", sum($"w").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select($"id", $"cum", $"tot")
    for (b <- Seq(1, 4, 32)) {
      val got = Rank.runningSums(rows, Nil, "v", Nil, Seq("cum" -> $"w"), b)
        .select($"id", $"cum", $"cum_total".as("tot"))
      assert(got.except(naive).isEmpty && naive.except(got).isEmpty,
        s"buckets=$b diverges from naive window")
    }
  }

  test("grouped row_number with tie-break matches partitioned window") {
    val naive = rows
      .withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"v", $"id")).cast("long"))
      .select($"id", $"rn")
    val got = Rank.runningSums(rows, Seq("g"), "v", Seq("id"),
        Seq("rn" -> lit(1L)), 8)
      .select($"id", $"rn")
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
  }

  test("multiple weights rank in one pass") {
    val naive = rows
      .withColumn("ca", sum($"w").over(Window.orderBy($"v", $"id")))
      .withColumn("cb", sum(lit(1L)).over(Window.orderBy($"v", $"id")))
      .select($"id", $"ca", $"cb")
    val got = Rank.runningSums(rows, Nil, "v", Seq("id"),
        Seq("ca" -> $"w", "cb" -> lit(1L)), 6)
      .select($"id", $"ca", $"cb")
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
  }

  test("ntileOf reproduces Spark ntile for uneven splits") {
    for (k <- Seq(3, 4, 7); n <- Seq(5, 10, 23)) {
      val df = (1 to n).toDF("rn")
      val naive = df.withColumn("t",
        ntile(k).over(Window.orderBy($"rn"))).select($"rn", $"t")
      val got = df.select($"rn",
        Rank.ntileOf($"rn", lit(n), k).as("t"))
      assert(got.except(naive).isEmpty && naive.except(got).isEmpty,
        s"k=$k n=$n")
    }
  }

  test("spearman endpoints: monotone +1, antitone -1 despite ties") {
    // build a synthetic lineitem-shaped check through the same rank
    // construction the query uses: monotone (y = 2x) and antitone
    // (y = -x) relationships with heavy ties in x
    import graft.operators.Rank
    val df = (1 to 300).map { i =>
      val x = (i % 20).toDouble
      ("g", x, 2 * x, -x)
    }.toDF("f", "x", "yup", "ydown")
    def rho(y: String): Double = {
      def ranks(c: String, as: String) = {
        val vals = df.groupBy($"f", col(c)).agg(count(lit(1)).as("c"))
        Rank.runningSums(vals, Seq("f"), c, Nil, Seq("hi" -> col("c")))
          .select($"f", col(c), ($"hi" - ($"c" - 1) / 2.0).as(as))
      }
      df.join(ranks("x", "rx"), Seq("f", "x"))
        .join(ranks(y, "ry"), Seq("f", y))
        .agg(corr($"rx", $"ry")).collect().head.getDouble(0)
    }
    assert(math.abs(rho("yup") - 1.0) < 1e-9)
    assert(math.abs(rho("ydown") + 1.0) < 1e-9)
  }

  test("prefixDotSumsLit equals prefixDotSums for any literal bounds") {
    import graft.operators.Rank
    // skewed values with heavy ties; bounds deliberately terrible
    // (all mass in two buckets) — boundaries are balance-only
    val hist = (1 to 500).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      (g, (i % 37).toDouble, (i % 7 + 1).toDouble, (i % 5 + 1).toDouble)
    }.toDF("g", "v", "a", "b")
      .groupBy($"g", $"v")
      .agg(sum($"a").as("a"), sum($"b").as("b"))
    val dots = Seq(("d1", col("a"), col("b")), ("d2", col("b"), col("a")))
    val tots = Seq(("ta", col("a")), ("tb", col("b")))
    val ref = Rank.prefixDotSums(hist, Seq("g"), "v", dots, tots)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    for (bounds <- Seq(Seq.empty[Double], Seq(5.0, 30.0),
        (1 until 32).map(_.toDouble))) {
      val got = Rank.prefixDotSumsLit(hist, Seq("g"), "v", dots, tots, bounds)
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      assert(got.keySet === ref.keySet, s"bounds=$bounds")
      for (g <- ref.keySet; (x, y) <- got(g).zip(ref(g)))
        assert(math.abs(x.asInstanceOf[Double] - y.asInstanceOf[Double])
          < 1e-9 * (1 + math.abs(y.asInstanceOf[Double])),
          s"bounds=$bounds group=$g: $x vs $y")
    }
  }

  test("mann-whitney on the real tables is finite and tie-consistent") {
    val row = SparkEntry.queries("q_mannwhitney")(spark, TestSpark.sf)
      .collect().head
    val (u, na, nb) = (row.getDouble(0), row.getLong(1), row.getLong(2))
    assert(na > 0 && nb > 0)
    // U is bounded by na*nb by construction
    assert(u >= 0 && u <= na.toDouble * nb)
    assert(!row.getDouble(3).isNaN)
  }

  test("rank-rebased query plans have no single-task window") {
    // the point of the primitive: every Window node left in these
    // queries' plans is partitioned AND includes the range-bucket
    // key, so no window sorts a whole table (or a whole 3-value
    // group) in one task at any scale.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (q <- Seq("q_percentile", "q_mad", "q_outlier_iqr",
        "q_weighted_percentile", "q_ntile", "q_gini", "q_ks_test", "q_rfm")) {
      val df = SparkEntry.queries(q)(spark, TestSpark.sf)
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty ||
          !w.partitionSpec.exists(_.references.exists(_.name == "_bucket")) => w
      }
      assert(bad.isEmpty, s"$q has ${bad.size} single-task-prone window(s)")
    }
  }
}
