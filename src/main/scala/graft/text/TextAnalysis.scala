package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: tokenization,
  * shingling, quality scoring, language ID, fingerprinting.
  *
  * Everything is a codegen'd built-in expression (split / transform /
  * regexp_count / md5) — no UDFs, so whole-stage codegen spans hold
  * and the ops parallelize trivially over document partitions.
  */
object TextAnalysis {

  /** Whitespace tokens, matching DuckDB string_split_regex(trim(x),'\s+'). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingles (space-joined), built from n shifted slices
    * zipped together.
    *
    * The lambdas reference ONLY their own arguments: an
    * `element_at(toks, i+j)` formulation captures the token
    * expression free in the lambda, and Catalyst re-evaluates a
    * captured non-attribute expression per element — with `toks` =
    * `split(...)`, that's 3·n_tokens regex splits per row (measured
    * ~150× slowdown). Here `toks` is evaluated O(n) times total.
    * Docs with fewer than n tokens yield an empty array (slice
    * length clamps to 0). */
  def shingles(toks: Column, n: Int): Column = {
    val len = greatest(size(toks) - (n - 1), lit(0))
    (1 to n).map(j => slice(toks, lit(j), len))
      .reduce((acc, p) => zip_with(acc, p, (a, b) => concat_ws(" ", a, b)))
  }

  /** (id, __shingles) with the token array materialized as a column
    * FIRST. Passing the raw `split()` expression into [[shingles]]
    * inlines it into every `element_at` lambda reference (~3·n_tokens
    * regex splits per row — measured 150× overhead); projecting it as
    * an attribute makes each reference a cheap row access, and
    * CollapseProject keeps multiply-referenced non-cheap aliases
    * un-inlined. */
  def shingleDocs(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    graft.Util.ensureParallelism(
      df.select(col(id).as("__id"), tokens(col(text)).as("__toks")))
      .select(col("__id"), shingles(col("__toks"), n).as("__shingles"))

  /** BPE-ish regex token count: letter runs, digit runs, single
    * punctuation — a cheap proxy for subword token budgeting. */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit(bpeishPattern)).cast("long")

  /** English-ish stopword count (quality scoring denominator). */
  val stopPattern = "\\b(?:the|a|an|and|or|of|to|in|is|it)\\b"
  def stopwordCount(text: Column): Column =
    regexp_count(lower(text), lit(stopPattern)).cast("long")

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,!?;:]")).cast("long")

  /** Language-ID stopword patterns. The prediction cascade must stay
    * in sync with the SQL oracle in TextQueries. */
  val langPatterns: Seq[(String, String)] = Seq(
    "en" -> "\\b(?:the|and|of|to|is|it)\\b",
    "de" -> "\\b(?:der|die|das|und|ist|nicht|mit|ein)\\b",
    "es" -> "\\b(?:el|los|las|y|que|un|una|por)\\b",
    "fr" -> "\\b(?:le|les|et|est|une|dans|pour|sur)\\b")
  val zhPattern = "[一-鿿]"

  /** Deterministic language prediction from stopword/CJK evidence. */
  def langPredict(text: Column): Column = {
    val lt = lower(text)
    val n = langPatterns.toMap.view.mapValues(p => regexp_count(lt, lit(p))).toMap
    val zh = regexp_count(text, lit(zhPattern))
    when(zh >= 3, "zh")
      .when(n("de") > n("en") && n("de") >= n("es") && n("de") >= n("fr"), "de")
      .when(n("es") > n("en") && n("es") >= n("fr"), "es")
      .when(n("fr") > n("en"), "fr")
      .otherwise("en")
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text
    * — the exact-dedup key that survives reformatting. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Per-document quality features in one projection. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_words", size(tokens(t)).cast("long"))
      .withColumn("n_chars_calc", length(t).cast("long"))
      .withColumn("punct_n", punctCount(t))
      .withColumn("stop_n", stopwordCount(t))
      .withColumn("stop_ratio", round(col("stop_n").cast("double") / col("n_words"), 4))
      .withColumn("avg_word_len",
        round(length(regexp_replace(t, "\\s+", "")).cast("double") / col("n_words"), 4))
  }
}
