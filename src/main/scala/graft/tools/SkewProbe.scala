package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-path probe (BASELINE.md skew table): engineer ONE hot join
  * key owning ~30% of lineitem, then time the same join+agg under
  *
  *   naive    — shuffle join, AQE skew split OFF (what a 100 TB
  *              cluster does when nobody handles the hot key: one
  *              reducer gets 30% of the table);
  *   aqe      — AQE skew-join split ON with thresholds scaled to the
  *              probe volume (the runtime re-plan path);
  *   salted   — `Util.saltedJoin`, the explicit salt for skew beyond
  *              what AQE handles.
  *
  * Auto-broadcast is disabled: at 100 TB the orders side is NOT
  * broadcastable, and letting local-mode broadcast the 2 MB probe
  * dimension would measure nothing. min-of-3 per variant.
  *
  * Usage: runMain graft.tools.SkewProbe <sfDir>   (e.g. .scale/sf1)
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/.scale/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // hot key: ~30% of lineitem rows reassigned to one orderkey the
    // orders side has exactly once — join output size is unchanged
    // (fan-out 1), only the SHUFFLE placement is skewed, which is the
    // phenomenon under test
    val hot = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(min($"o_orderkey")).head.getLong(0)
    val skewDir = java.nio.file.Files
      .createTempDirectory("graft_skew_li").toString
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("l_orderkey",
        when(pmod(xxhash64($"l_partkey", $"l_linenumber"), lit(100)) < 30,
          lit(hot)).otherwise($"l_orderkey"))
      .write.mode("overwrite").parquet(skewDir)

    val li = spark.read.parquet(skewDir)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_orderpriority")

    def revenue(j: DataFrame): DataFrame =
      j.groupBy($"o_orderpriority")
        .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))

    def timeIt(tag: String, mk: => DataFrame,
        confs: Map[String, String]): Unit = {
      val saved = confs.keys.map(k =>
        k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val runs = (0 to 3).map { _ =>
          val t0 = System.nanoTime()
          mk.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"SKEW $tag%-8s min=${runs.tail.min}%.2f warm=${runs.head}%.2f")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val joined = li.join(orders, $"l_orderkey" === $"o_orderkey")
    timeIt("naive", revenue(joined), Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "false"))
    timeIt("aqe", revenue(joined), Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the 256 MB production threshold to the probe volume
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m"))
    for (salts <- Seq(8, 32))
      timeIt(s"salt$salts", revenue(graft.Util.saltedJoin(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), orders,
        key = "o_orderkey", saltFrom = "l_extendedprice", salts = salts)), Map(
        "spark.sql.adaptive.skewJoin.enabled" -> "false"))

    // ---- skewed AGGREGATION (the claimed remaining saltedJoin
    // niche): same 30%-hot group key, algebraic agg (sum) and
    // distinct agg (countDistinct), naive vs salted two-phase. AQE's
    // skew split rebalances JOINS only, so if naive aggregation holds
    // up here it's Spark's own map-side partial aggregation doing the
    // work — and salting has no aggregation niche either.
    def aggNaiveSum() = li.groupBy($"l_orderkey")
      .agg(sum($"l_extendedprice").as("s"), count(lit(1)).as("n"))
    def aggSaltSum(salts: Int) = li
      .withColumn("__salt",
        pmod(xxhash64($"l_extendedprice"), lit(salts)).cast("int"))
      .groupBy($"l_orderkey", $"__salt")
      .agg(sum($"l_extendedprice").as("ps"), count(lit(1)).as("pn"))
      .groupBy($"l_orderkey")
      .agg(sum($"ps").as("s"), sum($"pn").as("n"))
    def aggNaiveDist() = li.groupBy($"l_orderkey")
      .agg(countDistinct($"l_extendedprice").as("nd"))
    // salt derived from the DISTINCT column: each distinct value maps
    // to exactly one salt, so per-salt distinct counts sum exactly
    def aggSaltDist(salts: Int) = li
      .withColumn("__salt",
        pmod(xxhash64($"l_extendedprice"), lit(salts)).cast("int"))
      .groupBy($"l_orderkey", $"__salt")
      .agg(countDistinct($"l_extendedprice").as("pnd"))
      .groupBy($"l_orderkey")
      .agg(sum($"pnd").as("nd"))
    timeIt("aggsum_naive", aggNaiveSum(), Map.empty)
    timeIt("aggsum_salt32", aggSaltSum(32), Map.empty)
    timeIt("aggdist_naive", aggNaiveDist(), Map.empty)
    timeIt("aggdist_salt32", aggSaltDist(32), Map.empty)
    // correctness cross-check of the salted shapes (hot key included)
    val n1 = aggNaiveSum().agg(sum($"n")).head.getLong(0)
    val n2 = aggSaltSum(32).agg(sum($"n")).head.getLong(0)
    val d1 = aggNaiveDist().agg(sum($"nd")).head.getLong(0)
    val d2 = aggSaltDist(32).agg(sum($"nd")).head.getLong(0)
    println(s"SKEWCHECK sum rows $n1==$n2 dist $d1==$d2")
    require(n1 == n2 && d1 == d2, "salted aggregation diverged")

    spark.stop()
  }
}
