package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-training-data pipeline
  * (SURVEY.md §2.C): language ID, quality scoring, token counting,
  * document fingerprinting. All regex/arith Column compositions —
  * codegen'd, shuffle-free, and reproducible bit-for-bit in the
  * DuckDB oracle. */
object TextFunctions {

  /** Marker-word counts per language (n-gram heuristic: tiny public
    * stopword marker sets; CJK detection would add a codepoint-class
    * count — the testdata corpus is Latin-script so it scores 0 and
    * is omitted from the tie order). */
  val markers: Map[String, String] = Map(
    "en" -> "\\b(the|and|of|to|in)\\b",
    "de" -> "\\b(der|die|und|das|ist)\\b",
    "es" -> "\\b(el|la|los|de|que)\\b",
    "fr" -> "\\b(le|la|les|et|des)\\b")

  def markerScore(text: Column, lang: String): Column =
    regexp_count(text, lit(markers(lang)))

  /** argmax over marker scores with fixed tie order en>de>es>fr. */
  def langId(text: Column): Column = {
    val en = markerScore(text, "en"); val de = markerScore(text, "de")
    val es = markerScore(text, "es"); val fr = markerScore(text, "fr")
    when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Canonical cleaning pass (LLM-corpus normalization): lowercase,
    * non-alphanumerics → space, whitespace runs collapsed, trimmed.
    * ASCII-class regexes only, so the semantics are engine-portable
    * (DuckDB: same pattern with the 'g' flag). */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  def wsTokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish pre-tokenizer piece count: letter runs, single digits,
    * single punctuation (GPT-2-style pre-tokenization shape). */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"))

  def punctCount(text: Column): Column = regexp_count(text, lit("[.!?,;:]"))

  def stopwordCount(text: Column): Column =
    regexp_count(text, lit("\\b(the|a|an|and|or|of|to|in|is|are)\\b"))

  def alphaCount(text: Column): Column = regexp_count(text, lit("[A-Za-z]"))

  /** Composite quality score in [0,1]: length saturation + stopword
    * density + alphabetic purity (the usual cheap pre-filter before
    * expensive model-based scoring). */
  def qualityScore(text: Column): Column = {
    val nTok = wsTokenCount(text).cast("double")
    val lenSat = least(lit(1.0d), nTok / 100.0d)
    val stopRatio = stopwordCount(text) / nTok
    val alphaRatio = alphaCount(text) / length(text).cast("double")
    round(lenSat * 0.3d + stopRatio * 0.3d + alphaRatio * 0.4d, 6)
  }

  /** Normalized-content fingerprint: hash of the sorted distinct
    * lowercase token set (OpenRefine-style key collapsing; robust to
    * word order and duplication). */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(split(lower(text), " "))), " "))
}
