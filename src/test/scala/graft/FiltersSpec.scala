package graft

import org.apache.spark.sql.functions._

import graft.filters.Filters

/** netmask6 / file-backed in-list (reference lib/filter/filter-netmask6.c,
  * filter-in-list.c) — round-2 completions.
  */
class FiltersSpec extends SparkSpec {
  import spark.implicits._

  private def hex6(ip: String): String =
    Seq(ip).toDF("ip").select(Filters.ipv6ToHex(col("ip"))).as[String].head()

  test("ipv6ToHex: :: expansion, padding, case folding") {
    assert(hex6("::") === "0" * 32)
    assert(hex6("::1") === "0" * 31 + "1")
    assert(hex6("2001:db8::8:800:200C:417A") ===
      "20010db8" + "0" * 8 + "0008" + "0800" + "200c" + "417a")
    assert(hex6("1:2:3:4:5:6:7:8") === "00010002000300040005000600070008")
    assert(hex6("fe80::") === "fe80" + "0" * 28)
  }

  test("netmask6: nibble-aligned and unaligned prefixes") {
    val ips = Seq(
      "2001:db8:4::1", "2001:db8:4:ffff::9", // in 2001:db8:4::/48
      "2001:db8:5::1", "2001:db9::1", "fe80::1").toDF("ip")
    def got(cidr: String): Set[String] =
      ips.filter(Filters.netmask6(col("ip"), cidr)).as[String].collect().toSet
    assert(got("2001:db8:4::/48") === Set("2001:db8:4::1", "2001:db8:4:ffff::9"))
    assert(got("2001:db8::/32") ===
      Set("2001:db8:4::1", "2001:db8:4:ffff::9", "2001:db8:5::1"))
    // /30: 2001:db8 vs 2001:db9 → first 30 bits equal (0xb8=10111000,
    // 0xb9=10111001 differ only in bit 32) → both match /30, only db8 /32
    assert(got("2001:db8::/30") ===
      Set("2001:db8:4::1", "2001:db8:4:ffff::9", "2001:db8:5::1", "2001:db9::1"))
    assert(got("::/0") === ips.as[String].collect().toSet)
  }

  test("matcher backends: type(pcre|string|glob) + flags (logmatcher.c, test_matcher.c)") {
    val df = Seq("árvíztűrőtükörfúrógép", "PTHREAD support initialized", "wiki").toDF("v")
    def got(tpe: String, pat: String, flags: String*): Set[String] =
      df.filter(Filters.matcher(pat, tpe, flags.toSet)(col("v"))).as[String].collect().toSet
    // pcre: unanchored find (test_matcher.c pcre_regexp)
    assert(got("pcre", "árvíz") === Set("árvíztűrőtükörfúrógép"))
    assert(got("pcre", "^tűrő") === Set.empty)
    assert(got("pcre", "pthread", "ignore-case") === Set("PTHREAD support initialized"))
    assert(got("pcre", "pthread") === Set.empty)
    // string: whole-value unless prefix/substring
    assert(got("string", "wiki") === Set("wiki"))
    assert(got("string", "wik") === Set.empty)
    assert(got("string", "wik", "prefix") === Set("wiki"))
    assert(got("string", "support", "substring") === Set("PTHREAD support initialized"))
    assert(got("string", "SUPPORT", "substring", "ignore-case") === Set("PTHREAD support initialized"))
    // glob: * ? full match
    assert(got("glob", "*support*") === Set("PTHREAD support initialized"))
    assert(got("glob", "wik?") === Set("wiki"))
    assert(got("glob", "wik") === Set.empty)
  }

  test("in-list(file): values load at plan time, InSet match") {
    val f = java.nio.file.Files.createTempFile("graft-inlist", ".txt")
    java.nio.file.Files.write(f, "login\nlogout\n\n  exec  \n".getBytes)
    val df = Seq("login", "read", "exec", "write").toDF("action")
    val got = df.filter(Filters.inListFile(col("action"), f.toString))
      .as[String].collect().toSet
    assert(got === Set("login", "exec"))
  }
}
