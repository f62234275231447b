package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.rewrite.Rewrites

class RewritesSpec extends SparkSpec {
  import spark.implicits._

  test("regexp_replace_first replaces only the first match (codegen path)") {
    val df = Seq("a1 b22 c333", "none").toDF("t")
    val got = df.select(
      GraftFunctions.regexp_replace_first(col("t"), "\\d+", "#").as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("a# b22 c333", "none"))
  }

  test("subst global vs first") {
    val df = Seq(("x", "a1 b2")).toDF("id", "t")
    val first = Rewrites.subst(df, "t", "\\d", "#").select("t").as[String].head()
    val global = Rewrites.subst(df, "t", "\\d", "#", global = true).select("t").as[String].head()
    assert(first == "a# b2" && global == "a# b#")
  }

  test("set with condition leaves non-matching rows unchanged") {
    val df = Seq((1, "keep"), (2, "orig")).toDF("id", "v")
    val got = Rewrites.set(df, "v", lit("NEW"), Some(col("id") === 2))
      .orderBy("id").select("v").as[String].collect().toSeq
    assert(got == Seq("keep", "NEW"))
  }

  test("set-pri bounds: invalid values leave pri unchanged") {
    val df = Seq((100, "300"), (100, "42"), (100, "junk")).toDF("pri", "v")
    val got = Rewrites.setPri(df, "pri", col("v")).select("pri").as[Int].collect().toSeq
    assert(got == Seq(100, 42, 100))
  }

  test("set-severity by name keeps facility") {
    val df = Seq(165).toDF("pri") // local4.notice: fac=20 sev=5
    val got = Rewrites.setSeverity(df, "pri", lit("err")).select("pri").as[Int].head()
    assert(got == 20 * 8 + 3)
  }

  test("set-facility by number keeps severity") {
    val df = Seq(165).toDF("pri")
    val got = Rewrites.setFacility(df, "pri", lit("0")).select("pri").as[Int].head()
    assert(got == 5)
  }

  test("groupset sets all glob-matched columns") {
    val df = Seq(("a", "b", "c")).toDF("f_one", "f_two", "other")
    val got = Rewrites.groupSet(df, Seq("f_*"), lit("X")).collect().head
    assert(got.getString(0) == "X" && got.getString(1) == "X" && got.getString(2) == "c")
  }

  test("set-tag / clear-tag") {
    val df = Seq((1, Seq("t0"))).toDF("id", "tags")
    val added = Rewrites.setTag(df, "tags", lit("t1"))
      .select("tags").as[Seq[String]].head()
    assert(added.toSet == Set("t0", "t1"))
    val cleared = Rewrites.clearTag(df.withColumn("tags", array(lit("t0"), lit("t1"))), "tags", lit("t0"))
      .select("tags").as[Seq[String]].head()
    assert(cleared == Seq("t1"))
  }

  test("fix-time-zone keeps the wall clock, set-time-zone keeps the instant") {
    val df = Seq(java.sql.Timestamp.valueOf("2026-06-01 12:00:00")).toDF("ts")
    // fix: the digits 12:00 were actually Berlin local (UTC+2 in June) →
    // instant shifts to 10:00 UTC
    val fixed = Rewrites.fixTimeZone(df, "ts", "Europe/Berlin")
      .select(date_format(col("ts"), "HH:mm")).as[String].head()
    assert(fixed === "10:00")
    // set: the instant stays, the wall clock converts
    val setTz = Rewrites.setTimeZone(df, "ts", "UTC", "Europe/Berlin")
      .select(date_format(col("ts"), "HH:mm")).as[String].head()
    assert(setTz === "14:00")
  }

  test("guess-time-zone picks the zone closest to the receive time") {
    // stamped 12:00 local, received 04:05 UTC → the sender is UTC+8
    val df = Seq((
      java.sql.Timestamp.valueOf("2026-06-01 12:00:00"),
      java.sql.Timestamp.valueOf("2026-06-01 04:05:00"))).toDF("ts", "recv")
    val got = Rewrites.guessTimeZone(df, "ts", col("recv"),
      Seq("UTC", "Europe/Berlin", "Asia/Shanghai", "America/New_York"))
      .select(col("ts_zone"), date_format(col("ts"), "HH:mm"))
      .as[(String, String)].head()
    assert(got === ("Asia/Shanghai", "04:00"))
  }

  test("value-pairs scopes + shift/replace-prefix/add-prefix transforms") {
    import graft.rewrite.Rewrites.{AddPrefix, ReplacePrefix, Shift}
    val df = Seq(("h1", "p1", 7, "m", Map(".sdata.x" -> "1")))
      .toDF("host", "prog", "pid", "text", "fields")
    val scoped = df.select(Rewrites.valuePairsScoped(df, Seq("selected-macros")).as("m"))
      .as[Map[String, String]].head()
    assert(scoped.keySet === Set("host", "prog", "pid")) // ts/pri absent from frame
    val everything = df.select(Rewrites.valuePairsScoped(df, Seq("everything"),
      excludeGlobs = Seq("fields")).as("m")).as[Map[String, String]].head()
    assert(everything.keySet === Set("host", "prog", "pid", "text"))
    // transforms compose left-to-right on both schema and map keys
    val t = df.select(Rewrites.valuePairsWithFields(df, Seq("selected-macros"),
      col("fields"), Seq(Shift(1), AddPrefix("nv."))).as("m"))
      .as[Map[String, String]].head()
    assert(t.keySet === Set("nv.ost", "nv.rog", "nv.id", "nv.sdata.x"))
    assert(Rewrites.ReplacePrefix(".sdata.", "sd.")(".sdata.x") === "sd.x")
    val rp = df.select(Rewrites.valuePairsWithFields(df, Seq("selected-macros"),
      col("fields"), Seq(ReplacePrefix(".sdata.", "sd."))).as("m"))
      .as[Map[String, String]].head()
    assert(rp.contains("sd.x") && rp.contains("host"))
  }

  test("valuePairs builds a map from glob-selected columns") {
    val df = Seq(("h1", "p1", 7)).toDF("host", "prog", "pid")
    val m = df.select(Rewrites.valuePairs(df, Seq("h*", "p*"), Seq("pid"),
      keyTransform = k => "nv." + k).as("m"))
      .as[Map[String, String]].head()
    assert(m == Map("nv.host" -> "h1", "nv.prog" -> "p1"))
  }

  test("store-matches / set-matches / unset-matches") {
    val df = Seq("user=alice id=42", "no pairs here").toDF("text")
    val m = Rewrites.storeMatches(df, "matches", col("text"), "id=(\\d+)")
      .select("matches").as[Seq[String]].collect()
    assert(m.exists(_ == Seq("id=42")) && m.exists(_.isEmpty))
    val set = Rewrites.setMatches(df, "matches", Seq(lit("a"), lit(7)))
      .select("matches").as[Seq[String]].head()
    assert(set === Seq("a", "7"))
    val un = Rewrites.unsetMatches(Rewrites.setMatches(df, "matches", Seq(lit("a"))), "matches")
      .select("matches").as[Seq[String]].head()
    assert(un === Seq.empty)
  }

  test("subst empty-match global semantics match PCRE (test_matcher.c empty_global)") {
    def rep(s: String, re: String, to: String, global: Boolean = true): String = {
      val df = Seq(s).toDF("t")
      Rewrites.subst(df, "t", re, to, global = global).select("t").as[String].head()
    }
    assert(rep("árvíztűrőtükörfúrógép", "árvíz", "favíz", global = false) === "favíztűrőtükörfúrógép")
    assert(rep("árvíztűrőtükörfúrógép", "^tűrő", "faró", global = false) === "árvíztűrőtükörfúrógép")
    assert(rep("árvíztűrőtükörfúrógép", "tűrő", "", global = false) === "árvíztükörfúrógép")
    assert(rep("wikiwiki", "wi", "") === "kiki")
    assert(rep("wikiwiki", "wi", "kuku") === "kukukikukuki")
    assert(rep("aa bb", "c*", "#") === "#a#a# #b#b#")
    assert(rep("aa bb", "a*", "#") === "## #b#b#")
    assert(rep("aa", "aa|b*", "@") === "@@")
    assert(rep("aa", "aa|b*", "@", global = false) === "@")
    assert(rep("aa", "b*|aa", "@", global = false) === "@aa")
    // declared divergence: PCRE's NOTEMPTY_ATSTART retry makes global
    // "b*|aa" on "aa" give "@@@"; java.util.regex advances instead: "@a@a@"
    assert(rep("aa", "b*|aa", "@") === "@a@a@")
  }

  test("substTemplate: per-match function template (cc-mask) masks every card") {
    val df = Seq(
      "pay 4111111111111111 now and 4222222222222 later",
      "no cards").toDF("text")
    val got = Rewrites.substTemplate(df, "text",
      "(?:4[0-9]{12}(?:[0-9]{3})?)",
      "$(substr $0 0 6)******$(substr $0 -4 4)", global = true)
      .select("text").as[String].collect().toSeq
    assert(got == Seq(
      "pay 411111******1111 now and 422222******2222 later", "no cards"))
  }

  test("substTemplate: cc-hash sha1 --length; first-match only without global") {
    val card = "4111111111111111"
    val h = java.security.MessageDigest.getInstance("SHA-1")
      .digest(card.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val df = Seq(s"a $card b $card").toDF("text")
    val first = Rewrites.substTemplate(df, "text",
      "4[0-9]{15}", "$(sha1 --length 16 $0)")
      .select("text").as[String].head()
    assert(first == s"a $h b $card")
  }

  test("substTemplate rejects unsupported functions at PLAN time (review fix)") {
    val df = Seq("x").toDF("text")
    val e = intercept[IllegalArgumentException] {
      Rewrites.substTemplate(df, "text", "x", "$(+ 1 2)y", global = true)
    }
    assert(e.getMessage.contains("not supported in a subst() replacement"))
  }

  test("MatchTemplates substr follows reference tf_substr offset rules") {
    def sub(t: String) =
      graft.functions.MatchTemplates.compile(t)(i => if (i == 0) Some("bzorp") else None)
    assert(sub("$(substr $0 1 3)") == "zor")   // test_basicfuncs.c:196
    assert(sub("$(substr $0 1)") == "zorp")
    assert(sub("$(substr $0 -1)") == "p")
    assert(sub("$(substr $0 -2 1)") == "r")
    assert(sub("$(substr $0 0 -1)") == "bzor") // negative len: leave 1 at end
    assert(sub("$(substr $0 2 1400)") == "orp") // len clipped to string end
    assert(sub("$(substr $0 9)") == "")        // start past end
    assert(sub("${1:-fallback}") == "fallback") // unbound group -> default
  }

  test("valuePairsWithFields: parsed field colliding with a schema column — schema wins") {
    val df = Seq(("schema-host", Map("host" -> "parsed-host", "extra" -> "e")))
      .toDF("host", "fields")
    val m = df.select(Rewrites.valuePairsWithFields(df, Seq("selected-macros"),
      col("fields")).as("m")).as[Map[String, String]].head()
    assert(m("host") === "schema-host") // no DUPLICATED_MAP_KEY, schema wins
    assert(m("extra") === "e")
  }
}
