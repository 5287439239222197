package graft.text

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._

/** Cross-document duplicate-span analysis — the C4/RefinedWeb-style
  * "remove any span that occurs verbatim in another document" signal,
  * computed as the fraction of each document's 8-token chunks whose
  * chunk also appears in at least one OTHER document.
  *
  * Scale shape: chunks become 60-bit md5 prefixes immediately after
  * extraction, so the chunk shuffle carries (doc_id, int64) pairs,
  * never strings; the global document-frequency table is chunk-keyed
  * and joins back on the integer. Chunk extraction is a single
  * generator pass (size-8 windows, ~tokens-per-doc instances), linear
  * in corpus tokens. Reference behavior: corpus-level text hygiene of
  * the reference's dataset prep (aws_infrastructure/
  * airflow-setup.py:172-241).
  */
object TextQueries5 extends QueryModule {

  val queries: Map[String, Q] = Map(
    "text_dup_spans" -> ((s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
      // n_chunks needs no chunk pass at all: a doc of n tokens has
      // exactly n-7 size-8 windows
      val docN = docs
        .select($"doc_id",
          (size(split(lower($"text"), " ")) - 7).cast("long").as("n_chunks"))
        .filter($"n_chunks" >= 1)
      // codegen'd one-pass extraction (empty array under 8 tokens, so
      // explode drops short docs without a separate filter); the
      // composable md5-over-slice lambda was ~60% of the sf1 runtime
      val chunks = docs.select($"doc_id",
        explode(graft.functions.ChunkMd5Hashes.of($"text", 8)).as("h"))
      // ONE h-keyed shuffle carries the whole chunk volume: hash(h)
      // partitioning satisfies both the (h, doc_id) grouping (h is a
      // subset of the keys) and the h-partitioned window, so the
      // within-doc collapse and the document-frequency count run on
      // the same exchange. The previous shape shuffled the full chunk
      // volume three times (distinct, groupBy h, join-back); window
      // partitions are df-sized (the docs sharing one chunk), so
      // parallelism stays chunk-cardinality wide.
      val perDoc = chunks.repartition($"h")
        .groupBy($"h", $"doc_id").agg(count(lit(1)).as("c"))
      val dfWin = org.apache.spark.sql.expressions.Window.partitionBy($"h")
      val dup = perDoc
        .withColumn("df", count(lit(1)).over(dfWin))
        .filter($"df" >= 2)
        .groupBy($"doc_id").agg(sum($"c").as("n_dup"))
      docN.join(dup, Seq("doc_id"), "left")
        .select($"doc_id", $"n_chunks",
          coalesce($"n_dup", lit(0L)).as("n_dup"),
          r4(coalesce($"n_dup", lit(0L)) / $"n_chunks".cast("double"))
            .as("dup_frac"))
        .orderBy($"doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "text_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t
        |  FROM documents WHERE len(string_split(lower(text), ' ')) >= 8),
        |chunks AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT) AS h
        |  FROM toks, LATERAL unnest(generate_series(1, len(t) - 7)) AS g(i)),
        |df AS (SELECT h, count(DISTINCT doc_id) AS df FROM chunks GROUP BY 1)
        |SELECT doc_id, count(*) AS n_chunks,
        |  count(*) FILTER (df >= 2) AS n_dup,
        |  round(count(*) FILTER (df >= 2) / CAST(count(*) AS DOUBLE), 4)
        |    AS dup_frac
        |FROM chunks JOIN df USING (h)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin
  )
}
