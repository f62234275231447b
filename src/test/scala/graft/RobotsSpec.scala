package graft

import org.apache.spark.sql.functions._

import graft.corpus.Robots

/** robots.txt parsing + fetch-policy evaluation (RFC 9309 subset). */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val txt =
    """# comment line
      |Disallow: /orphan
      |User-agent: *
      |Disallow: /private   # trailing comment
      |Allow: /private/ok
      |Disallow:
      |
      |User-agent: GraftBot
      |User-agent: otherbot
      |Disallow: /
      |Allow: /public
      |""".stripMargin

  private lazy val rules =
    Robots.parse(Seq(("ex.com", txt)).toDF("d", "t"), col("d"), col("t"))

  test("parse: groups, consecutive agents, comments, empty-value and orphan rules dropped") {
    val got = rules.select("agent", "rule", "path")
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("*", "disallow", "/private"),
      ("*", "allow", "/private/ok"),
      // the two consecutive user-agent lines share ONE group: both agents
      // carry both rules; agent names are lowercased
      ("graftbot", "disallow", "/"),
      ("graftbot", "allow", "/public"),
      ("otherbot", "disallow", "/"),
      ("otherbot", "allow", "/public")))
    // /orphan (before any group) and the empty Disallow are gone
    assert(!got.exists(_._3 == "/orphan") && !got.exists(_._3 == ""))
  }

  test("allowed: agent group shadows *, longest match wins, allow breaks ties") {
    val urls = Seq(
      (1L, "ex.com", "/private/x"),
      (2L, "ex.com", "/public/page"),
      (3L, "ex.com", "/anything"),
      (4L, "unknown.com", "/whatever")).toDF("id", "d", "p")
    val got = Robots.allowed(urls, col("id"), col("d"), col("p"), rules, "graftbot")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    // graftbot group exists -> '*' rules are shadowed entirely
    assert(got === Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))

    val star = Robots.allowed(urls, col("id"), col("d"), col("p"), rules, "unlisted-bot")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    // falls back to '*': /private blocked except the deeper /private/ok
    assert(star === Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
    val ok = Robots.allowed(
      Seq((9L, "ex.com", "/private/ok/deep")).toDF("id", "d", "p"),
      col("id"), col("d"), col("p"), rules, "unlisted-bot")
      .select("allowed").as[Boolean].head()
    assert(ok, "longest match (/private/ok, allow) beats /private (disallow)")
  }

  test("allowed: equal-length allow and disallow -> allow wins (RFC tiebreak)") {
    val r = Robots.parse(
      Seq(("t.com", "User-agent: *\nDisallow: /abc\nAllow: /abd\n"))
        .toDF("d", "t"), col("d"), col("t"))
    // craft a tie: same prefix length matching both is impossible with
    // distinct paths, so pin the struct-ordering directly: two rules of
    // equal length where only one matches each URL
    val urls = Seq((1L, "t.com", "/abc/x"), (2L, "t.com", "/abd/x"))
      .toDF("id", "d", "p")
    val got = Robots.allowed(urls, col("id"), col("d"), col("p"), r, "any")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true))
    // true tie on one URL: duplicate path as both allow and disallow
    val r2 = Robots.parse(
      Seq(("t.com", "User-agent: *\nDisallow: /p\nAllow: /p\n"))
        .toDF("d", "t"), col("d"), col("t"))
    val tie = Robots.allowed(Seq((1L, "t.com", "/p/x")).toDF("id", "d", "p"),
      col("id"), col("d"), col("p"), r2, "any")
      .select("allowed").as[Boolean].head()
    assert(tie, "allow wins the equal-specificity tie")
  }
}
