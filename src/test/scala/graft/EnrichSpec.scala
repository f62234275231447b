package graft

import org.apache.spark.sql.functions._

import graft.enrich.GeoIp

/** geoip2 range-bucket enrichment (reference modules/geoip2/) and
  * hosts-file DNS resolution (reference lib/dnscache.c persist-only). */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ranges = GeoIp.defaultRanges(spark).cache()

  test("dns-cache-hosts: hosts-file resolution, short/fqdn forms, ip fallback") {
    import graft.enrich.DnsCache
    val dir = java.nio.file.Files.createTempDirectory("graft-dns")
    java.nio.file.Files.write(dir.resolve("hosts"),
      ("# comment line\n" +
        "\n" +
        "10.0.0.1\tweb01.example.com www\n" +
        "10.0.0.2 db01.example.com\n" +
        "10.0.0.1 web01b.example.com\n" + // later entry overwrites (cache replace)
        "fe80::1 router.local\n").getBytes("UTF-8"))
    val hosts = DnsCache.hostsDf(spark, s"$dir/hosts")
    assert(hosts.count() === 3)
    val df = Seq("10.0.0.1", "10.0.0.2", "10.9.9.9", "fe80::1").toDF("ip")
    val short = DnsCache.resolveHost(df, col("ip"), hosts)
      .select("ip", "resolved").as[(String, String)].collect().toMap
    assert(short("10.0.0.1") === "web01b") // last wins, short form
    assert(short("10.0.0.2") === "db01")
    assert(short("10.9.9.9") === "10.9.9.9") // unmapped → address text
    assert(short("fe80::1") === "router") // v6 rows resolve too
    val fqdn = DnsCache.resolveHost(df, col("ip"), hosts, useFqdn = true)
      .select("ip", "resolved").as[(String, String)].collect().toMap
    assert(fqdn("10.0.0.2") === "db01.example.com")
    // broadcast hash join, never a nested loop
    val plan = DnsCache.resolveHost(df, col("ip"), hosts)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("wide /16 and fine /24 ranges resolve; misses stay NULL") {
    val df = Seq(
      ("10.2.200.7", 1L),   // even octet 2 → /16 region
      ("10.3.5.99", 2L),    // odd octet 3, j=5 → /24 city
      ("10.3.250.1", 3L),   // odd octet, j>7 → no range
      ("192.168.1.1", 4L),  // outside 10/8
      ("not-an-ip", 5L)
    ).toDF("ip", "k")
    val got = GeoIp.enrich(df, col("ip"), ranges)
      .orderBy("k")
      .select("geoip2_city", "geoip2_country_iso")
      .as[(Option[String], Option[String])].collect().toSeq
    assert(got(0) == ((Some("region-2"), Some("CO"))))   // char(65+2), char(65+14)
    assert(got(1) == ((Some("city-3-5"), Some("DV"))))   // char(65+3), char(65+21)
    assert(got(2) == ((None, None)))
    assert(got(3) == ((None, None)))
    assert(got(4) == ((None, None)))
  }

  test("lookup is a broadcast HASH join on the bucket key, not a nested-loop range join") {
    val df = Seq(("10.2.0.1", 1L)).toDF("ip", "k")
    val plan = GeoIp.enrich(df, col("ip"), ranges).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("every 10.fac.sev.x address in the fixture space resolves uniquely") {
    val probes = spark.range(0, 24 * 8)
      .select((col("id") / 8).cast("int").as("i"), (col("id") % 8).cast("int").as("j"))
      .select(concat_ws(".", lit("10"), col("i"), col("j"), lit("42")).as("ip"))
    val out = GeoIp.enrich(probes, col("ip"), ranges)
    assert(out.count() == 24 * 8) // non-overlapping: no fan-out
    assert(out.where(col("geoip2_country_iso").isNull).count() == 0)
  }
}
