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
}
