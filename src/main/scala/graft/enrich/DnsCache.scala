package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The deterministic half of the reference's DNS layer: hostname
  * resolution from a hosts-format file — `dns-cache-hosts()` +
  * `use-dns(persist-only)` (reference `lib/dnscache.c:215-280`, resolution
  * fallback `lib/host-resolve.c`). Live resolver lookups are inherently
  * nondeterministic (and a per-row network call is a scale anti-pattern);
  * the reference itself recommends persist-only + a hosts file for
  * high-volume sources, which is exactly a broadcast dimension join here.
  *
  * Hosts parsing mirrors the reference loop: empty/# lines skipped, first
  * token is the address, second token the name (aliases beyond the first
  * are ignored, as in dns_cache_check_hosts), later entries for the same
  * address overwrite earlier ones (the cache's replace semantics).
  */
object DnsCache {

  /** Driver-local hosts parse (last entry per address wins) — the
    * compile-time form $(dns-resolve-ip --dns-cache-hosts) binds into a
    * literal map. */
  def parseHostsLocal(path: String): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path)).asScala
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .foreach { l =>
        val t = l.split("[ \t]+").filter(_.nonEmpty)
        if (t.length >= 2) m(t(0)) = t(1)
      }
    m.toSeq
  }

  /** Parse a hosts file into an (ip, host) lookup frame. */
  def hostsDf(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        val toks = l.split("[ \t]+").filter(_.nonEmpty)
        if (toks.length >= 2) Some((toks(0), toks(1))) else None
      }
      .toDF("ip", "host")
      // last entry per ip wins (file order = monotone id here: one file,
      // one partition; at scale pass an explicit priority column instead)
      .withColumn("__ord", monotonically_increasing_id())
      .groupBy("ip").agg(max_by(col("host"), col("__ord")).as("host"))
  }

  /** Resolve an address column against the hosts frame (broadcast join):
    * adds `resolved` = the mapped name — trimmed at the first dot unless
    * `useFqdn` (host-resolve.c's convert_hostname_to_short form) — or the
    * address text itself when unmapped (the reference's fallback when
    * use-dns can't resolve).
    */
  def resolveHost(df: DataFrame, ip: Column, hosts: DataFrame,
      useFqdn: Boolean = false): DataFrame = {
    // the hosts side is fully aliased to reserved names so joining onto a
    // frame that already carries a `host` column (the canonical syslog
    // field) can't raise an ambiguous reference or clobber the caller's
    val name =
      if (useFqdn) col("__dns_host")
      else substring_index(col("__dns_host"), ".", 1)
    df.join(
        broadcast(hosts.select(col("ip").as("__dns_ip"), col("host").as("__dns_host"))),
        ip === col("__dns_ip"), "left")
      .withColumn("resolved", coalesce(name, ip.cast("string")))
      .drop("__dns_ip", "__dns_host")
  }
}
