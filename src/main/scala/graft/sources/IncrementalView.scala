package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance (IVM) over the change data feed — the
  * materialized-aggregate pattern every warehouse pays for nightly,
  * maintained here from row-level deltas instead of recomputation:
  *
  *   dst  =  SELECT key, count(*) n, sum(val) s FROM src GROUP BY key
  *
  * [[maintain]] consumes `src`'s change feed since the last maintained
  * version and folds it into `dst` as SIGNED deltas — +1 for `insert`
  * / `update_postimage`, −1 for `delete` / `update_preimage` (count
  * and sum are self-inverse under this signing, the classic
  * delta-rule for distributive aggregates). The consumption marker
  * lives in DST'S OWN manifest txns and commits atomically WITH the
  * maintained state (the appendEpoch discipline applied to view
  * maintenance): a crash between work and marker cannot double-apply,
  * a replayed maintain is a no-op, and racing maintainers lose the
  * commit CAS and rebase onto the winner's marker.
  *
  * Scale shape: one scan of the DELTA (never the source table), one
  * group-by over delta keys, one broadcastable outer join against the
  * aggregate (aggregate tables are key-cardinality-sized); groups
  * whose count reaches zero leave the view. 100 TB of source history
  * costs nothing — only the unconsumed tail is ever read. */
object IncrementalView {

  /** Fold src's unconsumed changes into dst. Returns the consumed
    * source version (unchanged when already caught up). */
  def maintain(spark: SparkSession, src: String, dst: String,
      keyCol: String, valCol: String, appId: String = "ivm",
      maxRetries: Int = 10): Long = {
    var attempts = 0
    while (true) {
      val srcHead = TxTable.snapshot(spark, src).getOrElse(
        throw new IllegalArgumentException(
          s"no committed version at $src")).version
      val dstSnap = TxTable.snapshot(spark, dst)
      val consumed = dstSnap.flatMap(_.txns.get(appId)).getOrElse(0L)
      if (srcHead <= consumed) return consumed // caught up: no-op
      val feed = TxTable.changeFeed(spark, src, consumed, Some(srcHead))
      val sign = when(col(TxTable.ChangeTypeCol)
        .isin("insert", "update_postimage"), 1L).otherwise(-1L)
      val delta = feed
        .groupBy(col(keyCol))
        .agg(sum(sign).as("__dn"),
          sum(sign * col(valCol)).as("__ds"))
      val merged = (dstSnap match {
        case Some(s) if s.files.nonEmpty =>
          TxTable.read(spark, dst).join(delta, Seq(keyCol), "full")
        case _ => delta
          .withColumn("n", lit(null).cast("long"))
          .withColumn("s", lit(null).cast("long"))
      })
        .select(col(keyCol),
          (coalesce(col("n"), lit(0L)) +
            coalesce(col("__dn"), lit(0L))).as("n"),
          (coalesce(col("s"), lit(0L)) +
            coalesce(col("__ds"), lit(0L))).as("s"))
        .filter(col("n") =!= 0L) // emptied groups leave the view
      try {
        TxTable.overwriteWithTxn(merged, dst, appId, srcHead)
        return srcHead
      } catch {
        case _: TxTable.TxConflictException =>
          // a racing maintainer (or writer) won: rebase — the loop
          // re-reads dst's marker, so a completed twin becomes a no-op
          attempts += 1
          if (attempts >= maxRetries) throw new TxTable.TxConflictException(
            s"maintain lost $maxRetries races at $dst")
      }
    }
    -1L // unreachable
  }
}
