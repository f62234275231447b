package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed dedup — the first dedup pass of a web
  * corpus (C4/CCNet drop repeated fetches of the same page before any
  * content hashing; the URL is the cheapest dedup key there is). All steps
  * are engine-portable regex/string builtins (no capture-group
  * replacements — Java spells them `$1`, RE2 `\1`, so canonicalization
  * avoids them entirely), evaluated in the scan stage.
  *
  * Canonical form:
  *  1. fragment stripped (`#...`),
  *  2. scheme + authority lowercased (path/query case is significant, the
  *     host is not — RFC 3986 §6.2.2.1),
  *  3. default ports stripped (`:443` for https, `:80` for http),
  *  4. leading `www.` stripped from the host,
  *  5. trailing slashes collapsed off the path,
  *  6. tracking params dropped (`utm_*`, `fbclid`, `gclid`, `ref`),
  *     remaining query params sorted (param order is almost never
  *     significant; sorting merges crawl-order variants).
  * Strings without a `scheme://` are returned unchanged (not URLs).
  */
object Url {

  /** Query params dropped before sorting (anchored regex, alternation). */
  val TrackingParamRe = "^(utm_[A-Za-z]+|fbclid|gclid|ref)(=|$)"

  def canonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val headRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
    val head = lower(regexp_extract(noFrag, s"($headRe)", 1))
    val rest = regexp_replace(noFrag, headRe, "")
    val h2 = when(head.startsWith("https://"), regexp_replace(head, ":443$", ""))
      .when(head.startsWith("http://"), regexp_replace(head, ":80$", ""))
      .otherwise(head)
    val h3 = regexp_replace(h2, "://www\\.", "://")
    val path = regexp_replace(regexp_replace(rest, "\\?.*$", ""), "/+$", "")
    val qs = regexp_extract(rest, "\\?(.*)$", 1)
    val params = array_sort(filter(split(qs, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe)))
    val cq = when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
      .otherwise(lit(""))
    when(head === "", u).otherwise(concat(h3, path, cq))
  }

  /** Lowercased host of a URL: authority minus userinfo and port. Empty
    * string for non-URLs (no `scheme://`). */
  def host(u: Column): Column =
    lower(regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1))

  /** True iff the URL's host equals a blocked domain or is a subdomain of
    * one. Literal-list form for small blocklists: one scan-stage exists()
    * over a literal array, no join at all. For web-scale blocklists use
    * [[filterBlockedDomains]].
    */
  def domainBlocked(u: Column, blocked: Seq[String]): Column = {
    val h = host(u)
    val arr = array(blocked.map(b => lit(b.toLowerCase)): _*)
    exists(arr, b => h === b || h.endsWith(concat(lit("."), b)))
  }

  /** Drop documents whose URL host matches (equals or is a subdomain of)
    * any domain in the `block` frame — the UT1/domain-blocklist filter of a
    * web corpus, built for blocklists too big for a literal array.
    *
    * Scale shape: a suffix match is only possible when the REGISTRABLE
    * domain (last two labels) of host and blocked domain agree, so the
    * anti-join is a broadcast HASH join on that key with the exact
    * equals-or-dot-suffix residual — the corpus side never shuffles, never
    * explodes, and no nested-loop join appears for the non-equi part.
    * Blocked domains must carry ≥ 2 labels (single-label TLD blocks are
    * not meaningful blocklist entries and would need a different key).
    *
    * Output: surviving docs + `url_host`.
    */
  /** Registrable domain of a host — last two labels (`a.b.c.com` →
    * `c.com`), the bucketing key for blocklists, per-domain caps and the
    * web graph. A public-suffix-aware version would swap in the PSL
    * table here. */
  def registrableDomain(h: Column): Column = {
    val ls = split(h, "\\.")
    array_join(slice(ls, greatest(size(ls) - 1, lit(1)), lit(2)), ".")
  }

  def filterBlockedDomains(
      docs: DataFrame, url: Column, block: DataFrame, domain: Column): DataFrame = {
    val b = block.select(lower(domain).as("__dom"))
      .withColumn("__bkey", registrableDomain(col("__dom")))
    val withHost = docs.withColumn("url_host", host(url))
      .withColumn("__hkey", registrableDomain(col("url_host")))
    withHost.join(broadcast(b),
      col("__hkey") === col("__bkey") &&
        (col("url_host") === col("__dom") ||
          col("url_host").endsWith(concat(lit("."), col("__dom")))),
      "left_anti")
      .drop("__hkey")
  }

  /** Per-document canonical URL + keeper flag (minimum id per canonical
    * URL survives). One combinable min aggregate + a hash join back — a
    * viral URL (one page fetched 10⁸ times) is a single group row, never a
    * window over the group.
    */
  def urlDedup(docs: DataFrame, id: Column, url: Column): DataFrame = {
    val c = docs.withColumn("canonical_url", canonicalize(url))
      .withColumn("__id", id)
    val keep = c.groupBy(col("canonical_url")).agg(min(col("__id")).as("__keep"))
    c.join(keep, Seq("canonical_url"))
      .withColumn("is_keeper", col("__id") === col("__keep"))
      .drop("__id", "__keep")
  }

  /** Per-domain quota cap — keep at most `cap` documents per registrable
    * domain, best-first (highest `quality`, ties broken by lowest id so
    * the choice is deterministic). Web-scale pipelines cap per-domain
    * contribution so no single site dominates the corpus (RefinedWeb,
    * Penedo et al. 2023 §3, and FineWeb apply exactly this shape after
    * URL dedup). Output: input columns + `domain`, `domain_rank` (1 =
    * best on its domain), `cap_keeper`.
    *
    * Scale shape: ONE window partitioned by domain — the shuffle key is
    * the domain, and the per-partition state is a running counter. A
    * mega-domain (10⁸ pages) makes that partition large but the window
    * still streams it; if a corpus has domains hot enough to matter, rank
    * within (domain, salt-bucket) first and cap per bucket at
    * cap/buckets — the [[graft.operators.Skew]] salting pattern.
    */
  def domainCap(
      docs: DataFrame, id: Column, url: Column, quality: Column,
      cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("domain"))
      .orderBy(quality.desc, id.asc)
    docs.withColumn("domain", registrableDomain(host(url)))
      .withColumn("domain_rank", row_number().over(w))
      .withColumn("cap_keeper", col("domain_rank") <= cap)
  }
}
