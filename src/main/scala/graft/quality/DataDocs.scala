package graft.quality

import org.apache.spark.sql.{DataFrame, Row}

/** Operator-facing validation docs — the GX data-docs analog. The
  * reference's checkpoint exists to produce human-readable docs from
  * each validation run (the gx config the Lambda ships,
  * aws_infrastructure/airflow-setup.py:321-340); here the same report
  * DataFrame that the parquet sink persists is additionally rendered
  * as one deterministic markdown page per (run_id, dataset), written
  * inside that dataset's partition directory so the artifact tree is
  * self-documenting.
  *
  * Scale note: a validation report is suite-sized (one row per
  * expectation), bounded by authored config, never by data volume —
  * the driver-side collect here is the same boundedness class as
  * GX rendering its own validation-result object.
  */
object DataDocs {

  /** Render one dataset's rows (already filtered) to markdown.
    * Deterministic: rows are sorted by (exp_name, col_name). */
  def renderMarkdown(dataset: String, runId: String,
      rows: Seq[Row]): String = {
    val sorted = rows.sortBy(r =>
      (r.getAs[String]("exp_name"), r.getAs[String]("col_name")))
    val nPass = sorted.count(_.getAs[Long]("success") == 1L)
    val sb = new StringBuilder
    sb ++= s"# Validation report: $dataset\n\n"
    sb ++= s"run: `$runId`  \n"
    sb ++= s"expectations: ${sorted.size}, passed: $nPass, " +
      s"failed: ${sorted.size - nPass}\n\n"
    sb ++= "| status | expectation | column | observed |\n"
    sb ++= "|---|---|---|---|\n"
    sorted.foreach { r =>
      val ok = if (r.getAs[Long]("success") == 1L) "PASS" else "FAIL"
      // %s of the double keeps full precision so the page parses back
      // to the exact report values (round-trip spec)
      sb ++= s"| $ok | ${cell(r.getAs[String]("exp_name"))} " +
        s"| ${cell(r.getAs[String]("col_name"))} " +
        s"| ${r.getAs[Double]("observed")} |\n"
    }
    sb.result()
  }

  /** Write `_index.md` into each (run_id, dataset) partition
    * directory of an already-written report artifact — the leading
    * underscore keeps Hadoop's hidden-file filter from feeding the
    * page to the parquet reader on reload. `report` must have columns
    * (dataset, exp_name, col_name, success, observed). */
  def write(report: DataFrame, path: String, runId: String): Unit = {
    val spark = report.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    report.collect().groupBy(_.getAs[String]("dataset")).foreach {
      case (ds, rows) =>
        for ((ext, page) <- Seq(
            "md" -> renderMarkdown(ds, runId, rows.toIndexedSeq),
            "html" -> renderHtml(ds, runId, rows.toIndexedSeq))) {
          val out = new org.apache.hadoop.fs.Path(
            path, s"run_id=$runId/dataset=$ds/_index.$ext")
          val os = fs.create(out, true)
          try os.write(page.getBytes("UTF-8")) finally os.close()
        }
    }
  }

  /** Render one dataset's rows as a standalone HTML page — the
    * operator-facing format GX itself ships (markdown stays the
    * machine-round-trip format, [[parseMarkdown]]). Same ordering and
    * content as the markdown page; fields are HTML-escaped. */
  def renderHtml(dataset: String, runId: String, rows: Seq[Row]): String = {
    def esc(s: String): String =
      if (s == null) ""
      else s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sorted = rows.sortBy(r =>
      (r.getAs[String]("exp_name"), r.getAs[String]("col_name")))
    val nPass = sorted.count(_.getAs[Long]("success") == 1L)
    val body = sorted.map { r =>
      val ok = r.getAs[Long]("success") == 1L
      val cls = if (ok) "pass" else "fail"
      s"""<tr class="$cls"><td>${if (ok) "PASS" else "FAIL"}</td>""" +
        s"<td>${esc(r.getAs[String]("exp_name"))}</td>" +
        s"<td>${esc(r.getAs[String]("col_name"))}</td>" +
        s"<td>${r.getAs[Double]("observed")}</td></tr>"
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8">
       |<title>Validation report: ${esc(dataset)}</title>
       |<style>
       |table { border-collapse: collapse; font-family: sans-serif; }
       |td, th { border: 1px solid #999; padding: 4px 10px; }
       |tr.pass td:first-child { color: #0a0; font-weight: bold; }
       |tr.fail td:first-child { color: #a00; font-weight: bold; }
       |</style></head><body>
       |<h1>Validation report: ${esc(dataset)}</h1>
       |<p>run: <code>${esc(runId)}</code><br>
       |expectations: ${sorted.size}, passed: $nPass,
       |failed: ${sorted.size - nPass}</p>
       |<table>
       |<tr><th>status</th><th>expectation</th><th>column</th><th>observed</th></tr>
       |$body
       |</table></body></html>
       |""".stripMargin
  }

  /** A literal `|` in a field would shift every cell after it; the
    * standard markdown-table escape (HTML entity) keeps the row shape
    * and round-trips through [[parseMarkdown]]. */
  private def cell(s: String): String =
    if (s == null) "" else s.replace("|", "&#124;")

  private def uncell(s: String): String = s.replace("&#124;", "|")

  /** Parse a rendered page back into (exp_name, col_name, success,
    * observed) tuples — the round-trip contract the spec pins. Cells
    * are taken by FIXED index from the 4-column row (split keeps
    * empties), so an empty col_name parses as "" instead of shifting
    * the remaining cells. */
  def parseMarkdown(md: String): Seq[(String, String, Long, Double)] =
    md.linesIterator
      .filter(l => l.startsWith("| PASS") || l.startsWith("| FAIL"))
      .map { l =>
        // "| PASS | exp | col | obs |" → ["", "PASS", "exp", "col", "obs", ""]
        val cells = l.split("\\|", -1).map(_.trim)
        (uncell(cells(2)), uncell(cells(3)),
          if (cells(1) == "PASS") 1L else 0L, cells(4).toDouble)
      }.toSeq
}
