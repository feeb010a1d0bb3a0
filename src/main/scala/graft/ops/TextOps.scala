package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data-pipeline workloads (north-star
  * extension, BASELINE.json): token/char statistics, language ID, quality
  * scoring, document fingerprinting — all built from codegen'd built-ins
  * (`split`, `regexp_count`, `regexp_replace`, `md5`), no UDFs, so they run
  * inside whole-stage codegen and scale linearly with the corpus: one
  * narrow map stage, no shuffle.
  */
object TextOps {

  /** Whitespace tokens of a (trimmed) text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace-collapsed, lowercased, trimmed normalization. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Per-document token/char statistics. Counts are BIGINT (engine-wide
    * convention so oracles agree on schema).
    */
  def textStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTokens = size(toks).cast("long")
    val tokenChars = length(regexp_replace(t, "\\s+", "")).cast("long")
    df.select(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      nTokens.as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("uniq_tokens"),
      (tokenChars.cast("double") / nTokens.cast("double")).as("avg_token_len"),
      // empty docs: NULL ratio, not a DIVIDE_BY_ZERO job abort (ANSI mode)
      when(length(t) > 0,
        regexp_count(t, lit("[.,;:!?]")).cast("double") / length(t).cast("double"))
        .as("punct_ratio"))
  }

  /** Token counting: plain whitespace tokens plus a BPE-ish segmentation
    * (letter runs / digit runs / single punctuation marks) — the usual cheap
    * proxy for subword token counts.
    */
  def tokenCount(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      size(tokens(t)).cast("long").as("ws_tokens"),
      regexp_count(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long").as("bpe_tokens"))
  }

  /** Language markers for the n-gram/stopword language-ID heuristic.
    * Deterministic and oracle-expressible (plain regex counts + CASE).
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|is)\\b",
    "de" -> "\\b(der|und|die|das)\\b",
    "fr" -> "\\b(le|la|et|les)\\b",
    "es" -> "\\b(el|los|que|una)\\b")

  /** Language ID: count marker-stopword hits per language, argmax with a
    * fixed preference order on ties (en > de > fr > es). Adds `pred_lang`,
    * preserving the input columns.
    */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val low = lower(col(textCol))
    val scores = langMarkers.map { case (_, pat) => regexp_count(low, lit(pat)) }
    val Seq(en, de, fr, es) = scores
    df.withColumn(
      "pred_lang",
      when(en >= de && en >= fr && en >= es, lit("en"))
        .when(de >= fr && de >= es, lit("de"))
        .when(fr >= es, lit("fr"))
        .otherwise(lit("es")))
  }

  /** Composite quality score from length, punctuation and stopword ratios —
    * each component clamped to [0,1], fixed weights; the shape of the
    * heuristics used to filter web-scale training corpora.
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTokens = size(tokens(t)).cast("double")
    val punctRatio = when(length(t) > 0,
      regexp_count(t, lit("[.,;:!?]")).cast("double") / length(t).cast("double"))
    val stopRatio =
      regexp_count(lower(t), lit("\\b(the|and|of|is|to|in|a)\\b")).cast("double") / nTokens
    df.select(
      col(idCol),
      nTokens.cast("long").as("n_tokens"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"),
      (lit(0.4) * least(lit(1.0), nTokens / lit(100.0)) +
        lit(0.3) * (lit(1.0) - least(lit(1.0), punctRatio * lit(10.0))) +
        lit(0.3) * least(lit(1.0), stopRatio * lit(5.0))).as("quality"))
  }

  /** Content fingerprint of the whitespace/case-normalized text (md5) — the
    * key for exact near-normalized dedup and cheap change detection.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = normalize(col(textCol))
    df.select(
      col(idCol),
      md5(norm).as("fingerprint"),
      length(norm).cast("long").as("norm_len"))
  }
}
