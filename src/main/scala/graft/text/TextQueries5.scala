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
      val toks = T.documents(s, d)
        .select($"doc_id", split(lower($"text"), " ").as("t"))
        .withColumn("n", size($"t"))
        .filter($"n" >= 8)
      val chunks = toks.select($"doc_id",
          explode(transform(sequence(lit(1), $"n" - 7),
            i => conv(substring(md5(concat_ws(" ", slice($"t", i, lit(8)))), 1, 15),
              16, 10).cast("long"))).as("h"))
        .localCheckpoint(false)
      val docFreq = chunks.select($"h", $"doc_id").distinct()
        .groupBy($"h").agg(count(lit(1)).as("df"))
      chunks.join(docFreq, "h")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          count_if($"df" >= 2).as("n_dup"))
        .select($"doc_id", $"n_chunks", $"n_dup",
          r4($"n_dup" / $"n_chunks".cast("double")).as("dup_frac"))
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
