package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** As-of join: for each left ("probe") row, attach the most recent
  * right ("reference") row with the same key and ts ≤ probe ts.
  *
  * Spark-first formulation: union the two sides tagged 0/1, then one
  * window pass per key ordered by (ts, tag, tiebreak) carrying the
  * last reference payload forward. ONE shuffle on the key — no custom
  * SparkPlan needed, no per-key collect; at 100 TB this costs the
  * same as a single repartition+sort, and skew is handled by AQE like
  * any other shuffle. Reference rows at exactly the probe ts are
  * eligible (tag orders them first).
  */
object AsOfJoin {

  /** @param payload  right-side columns to attach (prefixed `asof_`);
    *                 the right ts is always attached as `asof_<ts>`.
    * @param tiebreak unique column on both sides → total window order,
    *                 deterministic under equal timestamps. */
  def apply(left: DataFrame, right: DataFrame, key: String, ts: String,
      tiebreak: String, payload: Seq[String] = Nil): DataFrame = {
    val lType = StructType(left.schema.fields)
    val payCols = (ts +: payload).distinct
    val rType = StructType(right.select(payCols.map(col): _*).schema.fields)

    val l = left.select(
      col(key).as("__k"), col(ts).as("__ts"), col(tiebreak).as("__tb"),
      lit(1).as("__tag"),
      struct(left.columns.map(col): _*).as("__lrow"),
      lit(null).cast(rType).as("__pay"))
    val r = right.select(
      col(key).as("__k"), col(ts).as("__ts"), col(tiebreak).as("__tb"),
      lit(0).as("__tag"),
      lit(null).cast(lType).as("__lrow"),
      struct(payCols.map(col): _*).as("__pay"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionAll(r)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val outCols = left.columns.map(c => col(s"__lrow.$c").as(c)) ++
      payCols.map(c => col(s"__m.$c").as(s"asof_$c"))
    matched.select(outCols.toSeq: _*)
  }
}
