package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalize-before-dedup step every
  * web-corpus pipeline runs ahead of exact URL dedup and domain
  * filtering (the C4/RefinedWeb recipes dedup by canonical URL
  * before ever touching text). Pure column expressions over ONE
  * shared regex — no UDFs, fully codegen'd, and every rule is
  * replayable in a second engine's SQL (both sides use RE2-safe
  * syntax: no backrefs, no lookaround).
  *
  * Rules (RFC 3986 normalization subset + the www convention):
  * scheme and host lowercase; leading `www.` labels stripped
  * (ALL of them — one-label stripping broke idempotence on
  * `www.www.x`); default ports dropped (`:80` for http, `:443`
  * for https — after scheme lowering); fragment dropped; empty
  * path → `/`, trailing slashes stripped otherwise (the whole
  * run, same idempotence argument); query params sorted bytewise
  * (empty `?` dropped). The canonical form is a FIXED POINT:
  * canonicalize(canonicalize(u)) == canonicalize(u), spec-pinned
  * over generated messy inputs. Out of contract (documented, not
  * handled):
  * userinfo (`u@host`), IPv6 bracket hosts, percent-encoding case
  * — none appear in crawl frontier tables this operator targets;
  * a row with no `scheme://` prefix canonicalizes to NULL.
  */
object Urls {

  /** The shared component pattern: (1) scheme, (2) host, (3) :port,
    * (4) path, (5) ?query, (6) #fragment.
    */
  val UrlPattern: String =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]*)(:[0-9]+)?" +
      "([^?#]*)(\\?[^#]*)?(#.*)?"

  private def part(url: Column, i: Int): Column =
    regexp_extract(url, UrlPattern, i)

  /** Canonical host: lowercased, `www.`-stripped (NULL when the
    * value has no scheme — not a URL).
    */
  def urlHost(url: Column): Column =
    when(part(url, 1) === "", lit(null).cast("string"))
      .otherwise(regexp_replace(lower(part(url, 2)), "^(www\\.)+", ""))

  /** The full canonical form (see object doc for the rule set);
    * NULL when the value has no `scheme://` prefix.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(part(url, 1))
    val host = regexp_replace(lower(part(url, 2)), "^(www\\.)+", "")
    val rawPort = part(url, 3)
    val port = when(
      (scheme === "http" && rawPort === ":80") ||
        (scheme === "https" && rawPort === ":443"), "")
      .otherwise(rawPort)
    val stripped = regexp_replace(part(url, 4), "/+$", "")
    val path = when(stripped === "", "/").otherwise(stripped)
    val q = part(url, 5)
    val query = when(q === "" || q === "?", "")
      .otherwise(concat(lit("?"), array_join(array_sort(
        split(q.substr(lit(2), length(q)), "&", -1)), "&")))
    when(part(url, 1) === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, port, path, query))
  }

  /** The identical rule set as DuckDB SQL over a url expression —
    * generated beside the Column form so the two cannot drift.
    */
  def canonicalizeSql(urlExpr: String): String = {
    // DuckDB string literals do not backslash-escape, so the shared
    // pattern interpolates verbatim (it contains no single quotes)
    val p = UrlPattern
    def g(i: Int) = s"regexp_extract($urlExpr, '$p', $i)"
    val scheme = s"lower(${g(1)})"
    val host = s"regexp_replace(lower(${g(2)}), '^(www\\.)+', '')"
    val port = s"CASE WHEN ($scheme = 'http' AND ${g(3)} = ':80') " +
      s"OR ($scheme = 'https' AND ${g(3)} = ':443') THEN '' " +
      s"ELSE ${g(3)} END"
    val stripped = s"regexp_replace(${g(4)}, '/+$$', '')"
    val path = s"CASE WHEN $stripped = '' THEN '/' ELSE $stripped END"
    val query = s"CASE WHEN ${g(5)} IN ('', '?') THEN '' ELSE " +
      s"'?' || array_to_string(list_sort(string_split(" +
      s"substr(${g(5)}, 2), '&')), '&') END"
    s"CASE WHEN ${g(1)} = '' THEN NULL ELSE " +
      s"$scheme || '://' || $host || $port || $path || $query END"
  }

  def hostSql(urlExpr: String): String = {
    val p = UrlPattern
    s"CASE WHEN regexp_extract($urlExpr, '$p', 1) = '' THEN NULL " +
      s"ELSE regexp_replace(lower(regexp_extract($urlExpr, '$p', " +
      s"2)), '^(www\\.)+', '') END"
  }
}
