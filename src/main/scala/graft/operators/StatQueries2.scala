package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._

/** Second hypothesis-test / sampling batch: k-group omnibus tests and
  * weighted sampling.
  *
  * Same decomposition discipline as [[StatQueries]]: every statistic
  * reduces the fact table to a schema-bounded frame (per-group moment
  * rows, a pooled value histogram, a quantity×discount grid, k tuples
  * per group) with linear map-side-combinable scans before any ordered
  * or quadratic work — nothing here buffers a group or sorts a table.
  */
object StatQueries2 extends QueryModule {

  private val segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  val queries: Map[String, Q] = Map(
    // One-way ANOVA F across all 5 market segments' order totals.
    // Group sums are kept EXACT as cent BIGINTs so the between-group
    // sum of squares — a difference of two ~1e15 moment terms —
    // inherits no float summation noise from the scan; only the
    // within-group square sum is a double, and it appears without
    // catastrophic cancellation. One linear pass + a 5-row combine.
    "q_anova" -> ((s, d) => {
      import s.implicits._
      val rows = T.orders(s, d)
        .join(broadcast(T.customer(s, d)
            .select($"c_custkey", $"c_mktsegment")),
          $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment".as("g"),
          $"o_totalprice".cast("double").as("x"))
      val per = rows.groupBy($"g").agg(
        count(lit(1)).as("n"),
        sum(round($"x" * 100).cast("long")).as("sc"),
        sum(round($"x" * 100).cast("long").cast("double") / 100.0 *
          (round($"x" * 100).cast("long").cast("double") / 100.0)).as("q"))
      // cents→dollars exactly once per group so both engines run the
      // identical IEEE ops; ssb/ssw from the standard moment identity
      per.agg(
          sum($"n").as("nn"), count(lit(1)).as("k"),
          sum($"sc").as("s_all"),
          sum(($"sc".cast("double") / 100.0) *
            ($"sc".cast("double") / 100.0) / $"n").as("s2n"),
          sum($"q").as("qq"))
        .select(
          $"nn".as("n_rows"), $"k".as("k_groups"),
          r4((($"s2n" - ($"s_all".cast("double") / 100.0) *
              ($"s_all".cast("double") / 100.0) / $"nn") / ($"k" - 1)) /
            (($"qq" - $"s2n") / ($"nn" - $"k"))).as("f_stat"))
    }),

    // Kruskal-Wallis H across the same 5 segments: pooled midranks
    // over the (value)-keyed histogram — rank sums per group come from
    // [[Rank.prefixDotSums]] (exclusive-prefix dot products, no global
    // sort), tie correction from the same histogram. Every rank sum is
    // integer-exact in doubles, so both engines compute bit-identical
    // R_g and the statistic agrees to far beyond 4 decimals.
    "q_kruskal" -> ((s, d) => {
      import s.implicits._
      val seg = T.orders(s, d)
        .join(broadcast(T.customer(s, d)
            .select($"c_custkey", $"c_mktsegment")),
          $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment".as("g"), r4($"o_totalprice").as("v"))
      val perVal = seg.groupBy($"v").agg(count(lit(1)).as("c"),
        segments.map(x => count_if($"g" === x).as(s"c_$x")): _*)
      val dots = segments.map(x => (s"bl_$x", col(s"c_$x").cast("double")))
      val totals = segments.flatMap(x => Seq(
          (s"half_$x", col(s"c_$x") * (col("c") + 1) / 2.0),
          (s"n_$x", col(s"c_$x").cast("double")))) ++
        Seq(("ties", col("c").cast("double") * col("c") * col("c") - col("c")),
          ("nn", col("c").cast("double")))
      // every rank sum dots its own counts with the ONE pooled-count
      // prefix — the shared-b variant builds that prefix column once
      val agg = Rank.prefixDotSumsShared(perVal, Nil, "v",
        col("c").cast("double"), dots, totals)
      // Σ R_g²/n_g written as one left-to-right chain so the 5-term
      // accumulation order is pinned (matches the oracle's chain)
      val sumR2n = segments.map(x =>
        (col(s"bl_$x") + col(s"half_$x")) *
          (col(s"bl_$x") + col(s"half_$x")) / col(s"n_$x"))
        .reduce(_ + _)
      agg.select(
        $"nn".cast("long").as("n_rows"), lit(5L).as("k_groups"),
        r4((lit(12.0) / ($"nn" * ($"nn" + 1)) * sumR2n -
            lit(3.0) * ($"nn" + 1)) /
          (lit(1.0) - $"ties" / ($"nn" * $"nn" * $"nn" - $"nn"))).as("h_adj"))
    }),

    // Kendall tau-b between line-item quantity (50 levels) and
    // discount (11 levels): concordant/discordant pair counts from the
    // 550-cell joint histogram — one linear grouped scan, then a
    // broadcast grid self-join (≤550² comparisons, bounded by the
    // SCHEMA, never the data). All counts stay BIGINT-exact; the only
    // float op is the final normalization, so both engines agree
    // bit-for-bit before rounding.
    "q_kendall" -> ((s, d) => {
      import s.implicits._
      val cells = T.lineitem(s, d)
        .select($"l_quantity".cast("int").as("x"),
          round($"l_discount" * 100).cast("int").as("y"))
        .groupBy($"x", $"y").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val pairs = cells.select($"x".as("x1"), $"y".as("y1"), $"c".as("c1"))
        .join(broadcast(
            cells.select($"x".as("x2"), $"y".as("y2"), $"c".as("c2"))),
          $"x1" < $"x2")
        .agg(
          sum(when($"y1" < $"y2", $"c1" * $"c2").otherwise(0L)).as("nc"),
          sum(when($"y1" > $"y2", $"c1" * $"c2").otherwise(0L)).as("nd"))
      val marg = cells.agg(
        sum($"c").as("n"),
        sum($"c" * ($"c" - 1)).as("txy2"))
      val tx = cells.groupBy($"x").agg(sum($"c").as("cx"))
        .agg(sum($"cx" * ($"cx" - 1) / 2).as("tx"))
      val ty = cells.groupBy($"y").agg(sum($"c").as("cy"))
        .agg(sum($"cy" * ($"cy" - 1) / 2).as("ty"))
      pairs.crossJoin(broadcast(marg)).crossJoin(broadcast(tx))
        .crossJoin(broadcast(ty))
        .select($"n".as("n_rows"), $"nc", $"nd",
          r4(($"nc" - $"nd").cast("double") /
            sqrt(($"n" * ($"n" - 1) / 2 - $"tx").cast("double") *
              ($"n" * ($"n" - 1) / 2 - $"ty").cast("double"))).as("tau_b"))
    }),

    // Weighted sampling without replacement (Efraimidis–Spirakis
    // A-Res): top-10 orders per priority with inclusion probability
    // ∝ o_totalprice, selection key ln(u)/w from a DETERMINISTIC
    // md5-derived uniform so both engines draw the identical sample.
    // The scale path is the bounded TopKAgg — each group reduces
    // map-side to 10 tuples before the shuffle; no window ever sorts
    // a full group. (ln(u)/w ~ −1e-6 is far better conditioned than
    // u^(1/w) ~ 1−1e-6; top-key gaps sit ~1e8 ulps apart, so the
    // engines' ≤1-ulp ln() disagreement can never reorder the draw.)
    "q_weighted_sample" -> ((s, d) => {
      import s.implicits._
      val keyed = T.orders(s, d).select(
        $"o_orderpriority", $"o_orderkey",
        (log(
          (conv(substring(md5($"o_orderkey".cast("string")), 1, 8), 16, 10)
            .cast("double") + 0.5) / 4294967296.0) /
          $"o_totalprice".cast("double")).as("ky"))
      keyed.as[(String, Long, Double)]
        .groupByKey(_._1)
        .agg(new graft.functions.TopKAgg[(String, Long, Double)](
          10, t => (t._3, t._2)).toColumn.name("top"))
        .toDF("o_orderpriority", "top")
        .select($"o_orderpriority", posexplode($"top.items"))
        .select($"o_orderpriority", ($"pos" + 1).cast("int").as("rn"),
          $"col._2".as("o_orderkey"))
        .orderBy($"o_orderpriority", $"rn")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_anova" ->
      """WITH rows_ AS (
        |  SELECT c_mktsegment AS g, CAST(o_totalprice AS DOUBLE) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |per AS (
        |  SELECT g, count(*) AS n,
        |    sum(CAST(round(x * 100) AS BIGINT)) AS sc,
        |    sum(CAST(CAST(round(x * 100) AS BIGINT) AS DOUBLE) / 100.0 *
        |        (CAST(CAST(round(x * 100) AS BIGINT) AS DOUBLE) / 100.0)) AS q
        |  FROM rows_ GROUP BY g),
        |comb AS (
        |  SELECT sum(n) AS nn, count(*) AS k, sum(sc) AS s_all,
        |    sum((CAST(sc AS DOUBLE) / 100.0) *
        |        (CAST(sc AS DOUBLE) / 100.0) / n) AS s2n,
        |    sum(q) AS qq
        |  FROM per)
        |SELECT CAST(nn AS BIGINT) AS n_rows, k AS k_groups,
        |  round(((s2n - (CAST(s_all AS DOUBLE) / 100.0) *
        |      (CAST(s_all AS DOUBLE) / 100.0) / nn) / (k - 1)) /
        |    ((qq - s2n) / (nn - k)), 4) AS f_stat
        |FROM comb""".stripMargin,

    "q_kruskal" ->
      """WITH seg AS (
        |  SELECT c_mktsegment AS g, round(o_totalprice, 4) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT g,
        |    rank() OVER (ORDER BY v)
        |      + (count(*) OVER (PARTITION BY v) - 1)/2.0 AS rk
        |  FROM seg),
        |rs AS (SELECT
        |    sum(rk) FILTER (g = 'AUTOMOBILE') AS r1,
        |    count(*) FILTER (g = 'AUTOMOBILE') AS n1,
        |    sum(rk) FILTER (g = 'BUILDING') AS r2,
        |    count(*) FILTER (g = 'BUILDING') AS n2,
        |    sum(rk) FILTER (g = 'FURNITURE') AS r3,
        |    count(*) FILTER (g = 'FURNITURE') AS n3,
        |    sum(rk) FILTER (g = 'HOUSEHOLD') AS r4,
        |    count(*) FILTER (g = 'HOUSEHOLD') AS n4,
        |    sum(rk) FILTER (g = 'MACHINERY') AS r5,
        |    count(*) FILTER (g = 'MACHINERY') AS n5,
        |    CAST(count(*) AS DOUBLE) AS nn
        |  FROM r),
        |t AS (SELECT sum(CAST(cnt AS DOUBLE)*cnt*cnt - cnt) AS ties
        |  FROM (SELECT count(*) AS cnt FROM seg GROUP BY v))
        |SELECT CAST(nn AS BIGINT) AS n_rows, CAST(5 AS BIGINT) AS k_groups,
        |  round((12.0 / (nn * (nn + 1)) *
        |      (r1*r1/n1 + r2*r2/n2 + r3*r3/n3 + r4*r4/n4 + r5*r5/n5) -
        |      3 * (nn + 1)) /
        |    (1.0 - ties / (nn * nn * nn - nn)), 4) AS h_adj
        |FROM rs, t""".stripMargin,

    "q_kendall" ->
      """WITH cells AS (
        |  SELECT CAST(l_quantity AS INTEGER) AS x,
        |    CAST(round(l_discount * 100) AS INTEGER) AS y,
        |    count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |pairs AS (
        |  SELECT
        |    sum(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END) AS nc,
        |    sum(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END) AS nd
        |  FROM cells a JOIN cells b ON a.x < b.x),
        |marg AS (SELECT sum(c) AS n FROM cells),
        |tx_ AS (SELECT sum(cx * (cx - 1) / 2) AS tx
        |  FROM (SELECT sum(c) AS cx FROM cells GROUP BY x)),
        |ty_ AS (SELECT sum(cy * (cy - 1) / 2) AS ty
        |  FROM (SELECT sum(c) AS cy FROM cells GROUP BY y))
        |SELECT CAST(n AS BIGINT) AS n_rows,
        |  CAST(nc AS BIGINT) AS nc, CAST(nd AS BIGINT) AS nd,
        |  round(CAST(nc - nd AS DOUBLE) /
        |    sqrt(CAST(n * (n - 1) / 2 - tx AS DOUBLE) *
        |      CAST(n * (n - 1) / 2 - ty AS DOUBLE)), 4) AS tau_b
        |FROM pairs, marg, tx_, ty_""".stripMargin,

    "q_weighted_sample" ->
      """WITH keyed AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    ln((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |        ::BIGINT + 0.5) / 4294967296.0) /
        |      CAST(o_totalprice AS DOUBLE) AS ky
        |  FROM orders)
        |SELECT o_orderpriority, CAST(rn AS INTEGER) AS rn, o_orderkey
        |FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY ky DESC, o_orderkey ASC) AS rn
        |  FROM keyed)
        |WHERE rn <= 10
        |ORDER BY o_orderpriority, rn""".stripMargin
  )
}
