package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Sketch-backed operators from `spark-sketch`: Bloom-filter semi-join
  * reduction and count-min heavy hitters. Both sketches build as
  * mergeable per-partition partials (treeAggregate) — driver state is
  * the fixed-size sketch, never the data.
  */
object SketchQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    "q_bloom_prune" -> ((s, d) => {
      import s.implicits._
      // Runtime semi-join reduction: a Bloom filter over the selective
      // dim side's keys pre-filters the fact scan BEFORE the join
      // shuffle — at 100 TB this drops ~24/25ths of shuffled fact
      // bytes for a 1-nation query. False positives (fpp 1%) pass the
      // bloom but are removed by the real join, so the result stays
      // EXACT and the oracle is the plain join.
      val dim = T.supplier(s, d)
        .join(broadcast(T.nation(s, d).filter($"n_name" === "NATION_3")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name")
      // build the sketch as mergeable per-partition partials
      // (df.stat.bloomFilter NPEs in 4.1.2 on some inputs)
      val bf = dim.select($"s_suppkey").as[Long].rdd
        .treeAggregate(BloomFilter.create(100000L, 0.01))(
          (f, k) => { f.putLong(k); f },
          (a, b) => { a.mergeInPlace(b); a })
      // probe with the NATIVE might_contain expression over the
      // serialized sketch (BloomFilterImpl bytes — the same format
      // bloom_filter_agg emits), keeping the fact scan inside
      // whole-stage codegen; a Scala UDF here would force per-row
      // serialization on the hottest path of the query.
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val probe = org.apache.spark.sql.GraftColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.GraftColumnBridge.expression(lit(bos.toByteArray)),
          org.apache.spark.sql.GraftColumnBridge.expression($"l_suppkey")))
      T.lineitem(s, d)
        .select($"l_suppkey", $"l_extendedprice", $"l_discount")
        .filter(probe)
        .join(broadcast(dim), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_suppkey", $"s_name")
        .agg(count(lit(1)).as("n_items"),
          graft.Util.r4(sum($"l_extendedprice" * (lit(1) - $"l_discount")))
            .as("revenue"))
        .orderBy($"s_suppkey")
    }),

    "q_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      // Count-min heavy hitters: the CMS (eps 1e-4, fixed seed →
      // deterministic) estimates any key's frequency from kilobytes
      // of state. The hashed output is the exact top-10 plus a
      // sketch-sanity boolean, so the oracle verifies the sketch
      // without re-implementing it. The sketch is built IN the plan
      // by the native count_min_sketch aggregate (per-partition
      // partials merged as binaries — same mergeable-sketch shape as
      // the old treeAggregate, but lazy: constructing this DataFrame
      // runs NO job, where the previous form paid two eager scans
      // before the caller ever asked for a row). The 1-row sketch is
      // broadcast onto the 10 post-limit keys and probed in a typed
      // map — 10 deserializations total, off the hot path. Bound
      // note: est ≤ n + eps·N holds only with the sketch's δ=0.01
      // confidence PER QUERY; 3× slack makes a false alarm (δ³ per
      // key) practically impossible while still catching a broken
      // sketch.
      val li = T.lineitem(s, d).select($"l_partkey")
      val cmsBin = li.agg(expr(
        "count_min_sketch(l_partkey, 0.0001d, 0.99d, 42)").as("sk"))
      li.groupBy($"l_partkey").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"l_partkey")
        .limit(10)
        .crossJoin(broadcast(cmsBin))
        .as[(Long, Long, Array[Byte])]
        .map { case (k, n, sk) =>
          val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
            new java.io.ByteArrayInputStream(sk))
          val slack = math.ceil(3 * 1e-4 * cms.totalCount()).toLong
          val est = cms.estimateCount(k)
          (k, n, est >= n && est <= n + slack)
        }
        .toDF("l_partkey", "n", "cms_ok")
        .orderBy($"n".desc, $"l_partkey")
    }),

    // Sketch ROLLUP — the pre-aggregation pattern a 100 TB metrics
    // pipeline actually runs: build ONE HLL sketch per day from the
    // raw scan, then answer every 7-day window by UNIONING the seven
    // day-sketches. The windowed shuffle moves `days × 7` kilobyte
    // sketch rows, where the exact path (q_rolling_active) re-shuffles
    // `users × 7` rows — the sketch volume is constant in the user
    // count. Contract (same shape as q_approx_distinct/heavy_hitters):
    // the exact WAU rides along, and the hashed boolean pins the
    // merged estimate within 5% of it (lgK=12 ⇒ rsd ≈ 1.6%, and these
    // cardinalities sit in HLL's near-exact sparse regime).
    "q_sketch_rollup" -> ((s, d) => {
      import s.implicits._
      // one materialization of the distinct (user, day) frame — the
      // max-day scalar, the sketch arm, and the exact arm all read
      // its blocks instead of re-running the scan+distinct three times
      val act = T.events(s, d)
        .select($"user_id", $"ts".cast("date").as("day")).distinct()
        .localCheckpoint(false)
      val maxDay = act.agg(max($"day").as("max_day"))
      val daySketch = act.groupBy($"day")
        .agg(hll_sketch_agg($"user_id", lit(12)).as("sk"))
      val rolled = daySketch
        .select(explode(sequence($"day", date_add($"day", 6))).as("day"),
          $"sk")
        .crossJoin(broadcast(maxDay)).filter($"day" <= $"max_day")
        .groupBy($"day")
        .agg(hll_sketch_estimate(hll_union_agg($"sk", lit(true))).as("est"))
      val exact = act
        .select($"user_id",
          explode(sequence($"day", date_add($"day", 6))).as("day"))
        .distinct()
        .crossJoin(broadcast(maxDay)).filter($"day" <= $"max_day")
        .groupBy($"day").agg(count(lit(1)).as("wau"))
      exact.join(rolled, "day")
        .select($"day", $"wau",
          (abs($"est" - $"wau") <= $"wau" * 0.05).as("within_tol"))
        .orderBy($"day")
    }),

    // Distinct-set INTERSECTION at sketch cost — the operation HLL
    // cannot do (HLL unions only; intersections need Theta's
    // KMV-style sample). One pass builds a theta sketch per event
    // type as mergeable per-partition partials (the same
    // mergeable-sketch boundary as the bloom/count-min treeAggregate;
    // theta Unions are not java-Serializable, so the partials cross
    // the shuffle as compact sketch BYTES and merge by key), then
    // every type pair's audience overlap ("clicked AND purchased")
    // is a driver-side set operation over kilobyte sketches — at
    // 100 TB the raw alternative re-shuffles the full (user, type)
    // frame once per pair. Contract (the established sketch-gate
    // shape): the exact overlap rides along from the distinct frame,
    // and the hashed boolean pins the sketch estimate within 5%.
    "q_sketch_intersect" -> ((s, d) => {
      import s.implicits._
      import org.apache.datasketches.theta.{SetOperation, Sketches, UpdateSketch}
      import org.apache.datasketches.memory.Memory
      val act = T.events(s, d)
        .select($"event_type", $"user_id").distinct()
        .localCheckpoint(false)
      // per-partition partials → compact bytes → merge by type
      val partials = act.select($"event_type", $"user_id")
        .as[(String, Long)].rdd
        .mapPartitions { it =>
          val m = scala.collection.mutable.Map.empty[String, UpdateSketch]
          it.foreach { case (t, u) =>
            m.getOrElseUpdate(t, UpdateSketch.builder().build()).update(u)
          }
          m.iterator.map { case (t, sk) =>
            (t, sk.compact().toByteArrayCompressed)
          }
        }
        .reduceByKey { (a, b) =>
          val u = SetOperation.builder().buildUnion()
          u.union(Sketches.wrapCompactSketch(Memory.wrap(a)))
          u.union(Sketches.wrapCompactSketch(Memory.wrap(b)))
          u.getResult.toByteArrayCompressed
        }
        .collect().toMap
      // the driver pair loop is O(groups²) over kilobyte sketches —
      // sound ONLY at bounded group cardinality (event types, not a
      // user id). Refuse loudly rather than OOM the driver if this
      // pattern is ever pointed at a high-cardinality column.
      require(partials.size <= 64,
        s"q_sketch_intersect: ${partials.size} groups — the driver-side " +
          "pairwise intersection is bounded to 64 groups; a " +
          "high-cardinality group column needs a distributed pair join")
      val est: Map[(String, String), Double] = {
        val ts = partials.keys.toSeq.sorted
        (for {
          (a, i) <- ts.zipWithIndex; b <- ts.drop(i + 1)
        } yield {
          val ix = SetOperation.builder().buildIntersection()
          ix.intersect(Sketches.wrapCompactSketch(Memory.wrap(partials(a))))
          ix.intersect(Sketches.wrapCompactSketch(Memory.wrap(partials(b))))
          (a, b) -> ix.getResult.getEstimate
        }).toMap
      }
      val estDf = s.createDataFrame(est.toSeq.map { case ((a, b), e) =>
        (a, b, e)
      }).toDF("type_a", "type_b", "est")
      val exact = act.as("x").join(act.as("y"),
          $"x.user_id" === $"y.user_id" &&
            $"x.event_type" < $"y.event_type")
        .groupBy($"x.event_type".as("type_a"),
          $"y.event_type".as("type_b"))
        .agg(count(lit(1)).as("overlap"))
      exact.join(broadcast(estDf), Seq("type_a", "type_b"))
        .select($"type_a", $"type_b", $"overlap",
          (abs($"est" - $"overlap") <= $"overlap" * 0.05).as("within_tol"))
        .orderBy($"type_a", $"type_b")
    })
  )

  val oracles: Map[String, String] = Map(
    // Exact pairwise audience overlaps recomputed in DuckDB; the
    // theta-intersection 5% tolerance is the hashed boolean (≡ TRUE
    // when healthy — these cardinalities sit in theta's exact
    // sub-k regime).
    "q_sketch_intersect" ->
      """WITH act AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT x.event_type AS type_a, y.event_type AS type_b,
        |  count(*) AS overlap, TRUE AS within_tol
        |FROM act x JOIN act y
        |  ON x.user_id = y.user_id AND x.event_type < y.event_type
        |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin,

    "q_bloom_prune" ->
      """SELECT s_suppkey, s_name, count(*) AS n_items,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin,

    // Exact top-10 recomputed in DuckDB; the CMS over-estimate bound
    // est ∈ [n, n + eps·N] is the hashed boolean (≡ TRUE when healthy).
    "q_heavy_hitters" ->
      """SELECT l_partkey, count(*) AS n, TRUE AS cms_ok
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY n DESC, l_partkey LIMIT 10""".stripMargin,

    // Exact windowed distinct recomputed in DuckDB; the merged-sketch
    // 5% tolerance is the hashed boolean (≡ TRUE when healthy).
    "q_sketch_rollup" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |maxd AS (SELECT max(day) AS max_day FROM act),
        |expanded AS (SELECT DISTINCT user_id, CAST(w AS DATE) AS day
        |  FROM (SELECT user_id,
        |          unnest(generate_series(day, day + 6, INTERVAL 1 DAY)) AS w
        |        FROM act))
        |SELECT e.day, count(*) AS wau, TRUE AS within_tol
        |FROM expanded e, maxd WHERE e.day <= maxd.max_day
        |GROUP BY e.day ORDER BY e.day""".stripMargin
  )
}
