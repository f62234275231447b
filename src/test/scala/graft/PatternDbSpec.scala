package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import graft.parsers.PatternDb
import graft.parsers.PatternDb.{Cap, Matcher, PdbRule}

/** Ported cases from reference modules/correlation/tests/test_radix.c
  * (literal/escape trees, typed parser table) and test_patterndb.c
  * (rule dispatch); plus the Spark stage + typed promotion.
  */
class PatternDbSpec extends SparkSpec {

  /** Single-rule match helper: returns Some(captures) on match. */
  private def m1(pattern: String, key: String): Option[Seq[(String, String)]] = {
    val matcher = new Matcher(Seq(PdbRule("r", Seq(pattern))))
    val caps = new ArrayBuffer[Cap]
    val r = matcher.find(key, caps)
    if (r == null) None else Some(caps.toSeq.map(c => c.name -> c.value))
  }

  private def matchedRule(rules: Seq[(String, String)], key: String): String = {
    val matcher = new Matcher(rules.map { case (id, p) => PdbRule(id, Seq(p)) })
    val r = matcher.find(key, new ArrayBuffer[Cap])
    if (r == null) null else r.id
  }

  // ---- literal radix + @@ escape (test_radix.c:240-291) ----
  test("literal radix tree with @@ escapes, first-match dispatch") {
    val rules = Seq(
      "r1" -> "a@@NUMBER@@aa@@@@",   // literal a@NUMBER@aa@@
      "r2" -> "a@@@NUMBER:szam0@",   // literal a@ then NUMBER
      "r3" -> "a@NUMBER:szamx@aaa",
      "r4" -> "a@NUMBER@",
      "r5" -> "baa@NUMBER@",
      "r6" -> "newline@NUMBER@\n2ndline\n")
    assert(matchedRule(rules, "a@NUMBER@aa@@") == "r1")
    assert(matchedRule(rules, "a@15555") == "r2")
    assert(matchedRule(rules, "a15555aaa") == "r3")
    assert(matchedRule(rules, "newline123\r\n2ndline\n") == "r6") // CRLF skip
  }

  // ---- NUMBER (test_radix.c number cases) ----
  test("@NUMBER@: decimal, hex, negative; rejects non-digit start") {
    assert(m1("@NUMBER:n@", "12345 hihihi") == Some(Seq("n" -> "12345")))
    assert(m1("@NUMBER:n@", "0xaf12345 hihihi") == Some(Seq("n" -> "0xaf12345")))
    assert(m1("@NUMBER:n@", "0XABCDEF12345ABCDEF hihihi").get.head._2 == "0XABCDEF12345ABCDEF")
    assert(m1("@NUMBER:n@", "-12345 hihihi") == Some(Seq("n" -> "-12345")))
    assert(m1("@NUMBER:n@", "v12345").isEmpty)
  }

  // ---- FLOAT (test_radix.c float cases) ----
  test("@FLOAT@: int, fraction, exponent forms") {
    for ((in, want) <- Seq(
        "12345 hihihi" -> "12345", "12.345hihihi" -> "12.345",
        "12.345.6hihihi" -> "12.345", "12345.hihihi" -> "12345.",
        "-12.345e-12 hihihi" -> "-12.345e-12", "12.345E12 hihihi" -> "12.345E12"))
      assert(m1("@FLOAT:f@", in) == Some(Seq("f" -> want)), in)
    assert(m1("@FLOAT:f@", "v12345").isEmpty)
  }

  // ---- IPv4 / IPv6 / IPvANY (test_radix.c ip cases) ----
  test("@IPv4@/@IPv6@/@IPvANY@ accept/reject") {
    assert(m1("@IPv4:ip@", "192.168.1.1 huhuhu") == Some(Seq("ip" -> "192.168.1.1")))
    assert(m1("@IPv4:ip@", "192.168.1.1.huhuhu") == Some(Seq("ip" -> "192.168.1.1")))
    assert(m1("@IPv4:ip@", "192.168.1huhuhu").isEmpty)
    assert(m1("@IPv4:ip@", "192.168.1.333 x").isEmpty)
    assert(m1("@IPv6:ip@", "2001:DB8::8:800:200C:417A.huhuhu").get.head._2 == "2001:DB8::8:800:200C:417A")
    assert(m1("@IPv6:ip@", "::1.huhuhu") == Some(Seq("ip" -> "::1")))
    assert(m1("@IPv6:ip@", ":: huhuhu") == Some(Seq("ip" -> "::")))
    assert(m1("@IPv6:ip@", "0:0:0:0:0:0:13.1.68.3.huhuhu").get.head._2 == "0:0:0:0:0:0:13.1.68.3")
    assert(m1("@IPv6:ip@", "2001:0DB8:0:CD30::.huhuhu").get.head._2 == "2001:0DB8:0:CD30::")
    assert(m1("@IPvANY:ip@", "1:2:3:4:5:6:7:8 huhuhu").get.head._2 == "1:2:3:4:5:6:7:8")
    assert(m1("@IPvANY:ip@", "1:2:3:4:5:6:7 huhu").isEmpty)
    assert(m1("@IPvANY:ip@", "1:2:3:4:5:6:77777:8 huhu").isEmpty)
    assert(m1("@IPvANY:ip@", "1:2:3:4:5:6:1.2.333.4 huhu").isEmpty)
  }

  // ---- QSTRING (test_radix.c qstring cases) ----
  test("@QSTRING@: single delimiter and nesting open/close") {
    assert(m1("@QSTRING:q:'@", "'quoted string' hehehe") == Some(Seq("q" -> "quoted string")))
    assert(m1("@QSTRING:q:()@", "(quoted string) hehehe") == Some(Seq("q" -> "quoted string")))
    assert(m1("@QSTRING:q:()@", "(nested (quoted string())) hehehe")
      == Some(Seq("q" -> "nested (quoted string())")))
    assert(m1("@QSTRING:q:()@", "(unbalanced (nested (quoted string())) hehehe").isEmpty)
  }

  // ---- ESTRING incl. multi-char delimiter (test_radix.c estring cases) ----
  test("@ESTRING@: single and multi-char delimiters, capture excludes them") {
    assert(m1("ddd @ESTRING:e::@", "ddd estring: hehehe") == Some(Seq("e" -> "estring")))
    assert(m1("ddd @ESTRING:e::@", "ddd v12345").isEmpty)
    assert(m1("dddd @ESTRING:e::*@", "dddd estring:estring::* hehehe")
      == Some(Seq("e" -> "estring:estring:")))
    assert(m1("dddd2 @ESTRING:e::*@ d", "dddd2 estring:estring::* d")
      == Some(Seq("e" -> "estring:estring:")))
    assert(m1("dddd2 @ESTRING:e::*@ d", "dddd2 estring:estring:*").isEmpty)
  }

  // ---- STRING / SET / OPTIONALSET / ANYSTRING / NLSTRING ----
  test("string-family parsers") {
    assert(m1("@STRING:s@", "string hehehe") == Some(Seq("s" -> "string")))
    assert(m1("@STRING:s:_@", "a_b c") == Some(Seq("s" -> "a_b")))
    assert(m1("@SET:w: @aaa", " aaa") == Some(Seq("w" -> " ")))
    assert(m1("@SET:w: @aaa", "  aaa") == Some(Seq("w" -> "  ")))
    assert(m1("@SET:w: @aaa", "aaa").isEmpty)
    assert(m1("@OPTIONALSET:w: @aaa", "aaa") == Some(Seq("w" -> "")))
    assert(m1("x=@ANYSTRING:a@", "x=rest of line") == Some(Seq("a" -> "rest of line")))
    assert(m1("@NLSTRING:l@\nx", "line1\nx") == Some(Seq("l" -> "line1")))
    assert(m1("@NLSTRING:l@\nx", "line1\r\nx") == Some(Seq("l" -> "line1")))
  }

  // ---- MACADDR / LLADDR / EMAIL / HOSTNAME / PCRE ----
  test("address-family parsers and PCRE") {
    assert(m1("@MACADDR:m@ x", "0f:11:22:33:aB:cD x") == Some(Seq("m" -> "0f:11:22:33:aB:cD")))
    assert(m1("@LLADDR:m:3@x", "0f:11:22x") == Some(Seq("m" -> "0f:11:22")))
    assert(m1("@EMAIL:e:<>@ x", "<user@example.com> x") == Some(Seq("e" -> "user@example.com")))
    assert(m1("@EMAIL:e@ x", "u.name@ex.co x") == Some(Seq("e" -> "u.name@ex.co")))
    assert(m1("@HOSTNAME:h@ x", "db-1.prod.local x") == Some(Seq("h" -> "db-1.prod.local")))
    assert(m1("@PCRE:p:[a-c]+\\d@ x", "abc7 x") == Some(Seq("p" -> "abc7")))
  }

  // ---- dispatch semantics ----
  test("literal edge preferred over parser edge; parsers in insertion order") {
    // literal 'baa…' wins over '@NUMBER@' even though NUMBER could not
    // match 'b'; with both literal and parser viable the literal wins
    val rules = Seq("lit" -> "seq 12 done", "num" -> "seq @NUMBER:n@ done")
    assert(matchedRule(rules, "seq 12 done") == "lit")
    assert(matchedRule(rules, "seq 99 done") == "num")
    // two parsers at the same branch point: insertion order
    val r2 = Seq("a_num" -> "v=@NUMBER:n@!", "a_flt" -> "v=@FLOAT:f@!")
    assert(matchedRule(r2, "v=12!") == "a_num")
    assert(matchedRule(r2, "v=12.5!") == "a_flt") // NUMBER stops at '.', backtracks
  }

  test("complete match preferred over pattern-prefix (partial) match") {
    val rules = Seq("short" -> "get @STRING:a@", "long" -> "get @STRING:a@ @NUMBER:b@")
    assert(matchedRule(rules, "get x 42") == "long")
    // trailing unparsed input still matches the prefix rule (pass 2)
    assert(matchedRule(rules, "get x ???") == "short")
  }

  // ---- XML rule files ----
  test("patterndb XML rule file loads and dispatches") {
    val xml =
      """<patterndb version="4"><ruleset name="ssh" id="rs1">
        |<rules>
        |<rule id="ssh-accept" class="secevt"><patterns>
        |  <pattern>Accepted @ESTRING:auth: @for @ESTRING:user: @from @IPvANY:src_ip@ port @NUMBER:port@ ssh2</pattern>
        |</patterns><tags><tag>auth.success</tag></tags></rule>
        |<rule id="ssh-fail" class="secevt"><patterns>
        |  <pattern>Failed password for @ESTRING:user: @from @IPvANY:src_ip@ port @NUMBER:port@ ssh2</pattern>
        |</patterns></rule>
        |</rules></ruleset></patterndb>""".stripMargin
    val rules = PatternDb.loadXml(xml)
    assert(rules.map(_.id) == Seq("ssh-accept", "ssh-fail"))
    assert(rules.head.tags == Seq("auth.success"))
    val matcher = new Matcher(rules)
    val caps = new ArrayBuffer[Cap]
    val hit = matcher.find("Accepted publickey for root from 10.0.0.7 port 22022 ssh2", caps)
    assert(hit.id == "ssh-accept")
    assert(caps.map(c => c.name -> c.value).toMap ==
      Map("auth" -> "publickey", "user" -> "root", "src_ip" -> "10.0.0.7", "port" -> "22022"))
  }

  // ---- Spark stage + typed promotion ----
  test("annotate + promote: typed columns, unmatched tagged not dropped") {
    import spark.implicits._
    val rules = Seq(
      PdbRule("num", Seq("n=@NUMBER:n@ f=@FLOAT:f@"), ruleClass = "metrics"),
      PdbRule("hex", Seq("h=@NUMBER:h@")))
    val df = Seq("n=42 f=2.5e1", "h=0x1F", "garbage").toDF("text")
    val out = PatternDb.promote(PatternDb.annotate(df, "text", rules), rules)
      .select("text", "pdb_rule", "pdb_class", "n", "f", "h", "pdb_tags")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4),
        if (r.isNullAt(5)) null else r.getLong(5),
        r.getSeq[String](6))).toSeq.sortBy(_._1)
    assert(out(0) == ("garbage", null, null, null, null, null, Seq(PatternDb.ParseErrorTag)))
    assert(out(1) == ("h=0x1F", "hex", "system", null, null, 31L, Seq()))
    assert(out(2) == ("n=42 f=2.5e1", "num", "metrics", 42L, 25.0, null, Seq()))
  }

  test("radix dispatch over 2000 rules: first-match + typed captures intact") {
    // thousands of rules sharing literal prefixes exercise edge splitting;
    // dispatch stays O(message length) regardless of rule count
    val rules = (0 until 2000).map { i =>
      PdbRule(s"r$i", Seq(s"svc-$i: op=@ESTRING:op: @took=@NUMBER:ms@ms"))
    }
    val matcher = new Matcher(rules)
    val caps = new ArrayBuffer[Cap]
    for (i <- Seq(0, 7, 999, 1999)) {
      caps.clear()
      val hit = matcher.find(s"svc-$i: op=read took=42ms", caps)
      assert(hit != null && hit.id == s"r$i")
      assert(caps.map(c => c.name -> c.value).toMap == Map("op" -> "read", "ms" -> "42"))
    }
    assert(matcher.find("svc-2000: op=x took=1ms", new ArrayBuffer[Cap]) == null)
  }

  test("promote survives captures ANSI casts reject; bad atom params fail at load") {
    import spark.implicits._
    // FLOAT accepts '12e' (exponent marker, no digits) — promote must
    // yield null, not kill the job under ANSI mode
    val rules = Seq(PdbRule("f", Seq("v=@FLOAT:score@!")))
    val out = PatternDb.promote(
      PatternDb.annotate(Seq("v=12e!").toDF("text"), "text", rules), rules)
      .select("pdb_rule", "score").collect().head
    assert(out.getString(0) == "f" && out.isNullAt(1))
    // config-time rejection of malformed atoms (reference rule-load errors)
    intercept[IllegalArgumentException] {
      new Matcher(Seq(PdbRule("q", Seq("x=@QSTRING:v@"))))
        .find("x=1", new ArrayBuffer[Cap])
    }
    intercept[IllegalArgumentException] {
      new Matcher(Seq(PdbRule("l", Seq("x=@LLADDR:v:abc@"))))
        .find("x=1", new ArrayBuffer[Cap])
    }
  }

  test("app-parser: merged rulesets detect the application via pdb_class") {
    import spark.implicits._
    val apps = Map(
      "sshd" -> Seq(PdbRule("ssh-fail",
        Seq("Failed password for @ESTRING:user: @from @IPvANY:ip@"))),
      "nginx" -> Seq(PdbRule("ngx-req",
        Seq("@IPvANY:client@ - GET @ESTRING:path: @HTTP"))))
    val df = Seq(
      "Failed password for root from 10.0.0.9",
      "10.1.2.3 - GET /idx.html HTTP",
      "unrelated").toDF("text")
    val got = PatternDb.appParser(df, "text", apps)
      .select("pdb_class", "pdb_rule").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("sshd", "ssh-fail"), ("nginx", "ngx-req"), (null, null)))
  }
}
