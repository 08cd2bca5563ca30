package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registrable-domain extraction — the
  * curation primitive every web-scale corpus pipeline (CCNet,
  * RefinedWeb, Dolma) runs BEFORE text dedup: the same page fetched
  * as `HTTP://WWW.Site.com/a/?utm_source=x` and
  * `https://site.com/a` must collapse to one key, or URL-keyed
  * dedup, per-domain budgets, and provenance all silently fragment.
  *
  * Everything here is column arithmetic over the codegen'd regexp
  * expressions — no UDF; the one higher-order lambda (query-param
  * sort) runs over arrays of a handful of elements. The rules are the
  * standard conservative set: scheme and host lowercase, `www.`
  * prefix and default ports (80/443) stripped, trailing path slashes
  * removed, fragments dropped, tracker params (`utm_*`, `fbclid`)
  * removed, surviving params sorted byte-wise so param order never
  * splits a key. Non-URL input (no `scheme://`) canonicalizes to
  * `"://"`-prefixed emptiness rather than throwing — gate upstream if
  * strictness is needed.
  *
  * Registrable domain is a REGEX approximation of the public-suffix
  * list: known two-part suffixes (`co.uk`-style) keep three labels,
  * everything else keeps two. The full PSL is a data file refreshed
  * out-of-band; the regex covers the common suffixes deterministically
  * and oracle-portably.
  */
object Url {

  def urlScheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host, `www.` and default ports stripped. */
  def urlHost(u: Column): Column = {
    val hp = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    regexp_replace(regexp_replace(hp, ":(80|443)$", ""), "^www\\.", "")
  }

  /** Path with trailing slashes removed (`/a/` ≡ `/a`, root ≡ ""). */
  def urlPath(u: Column): Column =
    regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")

  /** Query string minus tracker params, remaining params sorted. */
  def urlQueryCanonical(u: Column): Column = {
    val qs = regexp_extract(u, "\\?([^#]*)", 1)
    array_join(
      array_sort(filter(split(qs, "&"),
        p => !(p === "" || p.rlike("^(utm_[^=]*|fbclid)=")))),
      "&")
  }

  def canonicalizeUrl(u: Column): Column = {
    val q = urlQueryCanonical(u)
    concat(urlScheme(u), lit("://"), urlHost(u), urlPath(u),
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Registrable domain of an already-normalized host ([[urlHost]]):
    * three labels under known two-part suffixes, else two. */
  def registrableDomain(host: Column): Column =
    regexp_extract(host,
      "([^.]+\\.(?:co|com|org|net|ac|gov)\\.[a-z]{2}|[^.]+\\.[^.]+)$", 1)
}
