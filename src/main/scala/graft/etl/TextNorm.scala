package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization mirroring the reference's `normalize_text`
  * (reference: dags/etl_grammy_spotify.py:105-111): lowercase, trim,
  * unify artist-separator tokens (`feat.|featuring|ft.|&|and` → `;`),
  * collapse runs of whitespace.
  *
  * Pure `functions._` column expressions — whole-stage-codegen'd, no
  * UDF, so the normalization runs inside the scan's codegen stage at
  * any scale.
  */
object TextNorm {

  /** Separator-unification pattern, verbatim from the reference. */
  val SeparatorPattern = """\s*(feat\.|featuring|ft\.|&|and)\s*"""

  /** Full reference normalization: lower → trim → separators → ws. */
  def normalizeText(c: Column): Column =
    regexp_replace(
      regexp_replace(trim(lower(c)), SeparatorPattern, ";"),
      """\s+""", " ")

  /** The lighter Spotify-side normalization (lower + trim only),
    * reference dags/etl_grammy_spotify.py:116-117. */
  def normalizeKey(c: Column): Column = trim(lower(c))

  /** First whitespace-delimited token — used for prefix-fallback
    * matching (analog of the reference's "part before '('" match,
    * dags/etl_grammy_spotify.py:236). */
  def firstToken(c: Column): Column = regexp_extract(c, """^(\S+)""", 1)
}
