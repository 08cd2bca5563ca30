package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders (SURVEY.md §2 #28–30): language ID,
  * quality scoring, token counting. All built-in regex functions —
  * codegen'd, no UDFs — and all counts are integers so results are
  * exact and engine-portable (no float-rounding ambiguity).
  */
object TextFunctions {

  /** Marker-word patterns per language (ASCII word-boundary regex —
    * identical semantics in Java regex and RE2). */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> """\b(the|of|with|for)\b""",
    "es" -> """\b(el|la|de|los|que)\b""",
    "fr" -> """\b(le|les|des|et|un)\b""",
    "de" -> """\b(der|die|und|das|ein)\b""")

  /** Count of regex matches in a column (whole-match). */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Per-language marker scores, in [[LangMarkers]] order. */
  def langScores(text: Column): Seq[Column] =
    LangMarkers.map { case (lang, p) => matchCount(text, p).as(s"s_$lang") }

  /** Arg-max language with deterministic tie preference in
    * [[LangMarkers]] order; all-zero → "und". */
  def predictedLang(scores: Seq[Column]): Column = {
    val langs = LangMarkers.map(_._1)
    val allZero = scores.map(_ === 0L).reduce(_ && _)
    val chain = langs.zipWithIndex.foldRight(lit("und")) { case ((lang, i), els) =>
      val isMax = scores.zipWithIndex
        .filter(_._2 != i)
        .map { case (other, _) => scores(i) >= other }
        .reduceOption(_ && _)
        .getOrElse(lit(true))
      when(isMax, lit(lang)).otherwise(els)
    }
    when(allZero, lit("und")).otherwise(chain)
  }

  def whitespaceTokenCount(text: Column): Column = matchCount(text, """\S+""")

  /** BPE-ish word tokens: lowercase alphanumeric runs. */
  def wordTokenCount(text: Column): Column = matchCount(text, """[a-z0-9]+""")

  def stopwordCount(text: Column): Column = matchCount(text, """\b(the|a|of|in)\b""")

  /** Integer quality score in [0, 1500]: capped length component +
    * stopword component. Deterministic, exact, aggregation-safe. */
  def qualityScoreMilli(nTokens: Column, nStopwords: Column): Column =
    (least(lit(100L), nTokens) * 10L + least(lit(100L), nStopwords) * 5L).cast("long")
}
