package graft

import org.apache.spark.sql.functions._
import graft.parsers.{GrokRule, GrokStage}
import graft.transcripts.Transcripts

class GrokSpec extends SparkSpec {
  import spark.implicits._

  private def parse(lines: String*): Seq[(String, Map[String, String], Seq[String])] = {
    val df = lines.toDF("text")
    GrokStage(df, "text", GrokStage.transcriptRules)
      .select(col("rule_id"), col("fields"), col("tags"))
      .collect()
      .map(r => (r.getString(0), r.getMap[String, String](1).toMap, r.getSeq[String](2)))
      .toSeq
  }

  test("syslog line parses into typed captures") {
    val Seq((rule, fields, tags)) =
      parse("<36>May  5 04:04:28 host-4 prog-4[104]: action=exec status=ok")
    assert(rule == "syslog")
    assert(fields("pri") == "36" && fields("host") == "host-4" &&
      fields("prog") == "prog-4" && fields("pid") == "104" &&
      fields("action") == "exec" && fields("status") == "ok")
    assert(tags.isEmpty)
  }

  test("kv, json, csv lines each hit their rule") {
    val got = parse(
      "event=tool_call tool=search duration_ms=77 ok=true",
      """{"event":"turn","role":"system","tokens":76,"status":"ok"}""",
      "conv-000000,4,user,83").map(_._1)
    assert(got == Seq("kv", "json", "csv"))
  }

  test("unmatched rows get the parse-error tag, are not dropped") {
    val Seq((rule, fields, tags)) = parse("~~CORRUPT#194##")
    assert(rule == null && fields.isEmpty && tags == Seq(GrokStage.ParseErrorTag))
  }

  test("first-match-wins ordering") {
    val rules = Seq(
      GrokRule("broad", """^a(\w+)$""", Seq("x")),
      GrokRule("narrow", """^ab(\w+)$""", Seq("y")))
    val df = Seq("abc").toDF("text")
    val r = GrokStage(df, "text", rules).select("rule_id").as[String].head()
    assert(r == "broad")
  }

  test("non-ASCII text takes the decode fallback with identical semantics") {
    val Seq((rule, fields, _)) =
      parse("event=café tool=über duration_ms=5 ok=true")
    assert(rule == "kv")
    assert(fields("event") == "café" && fields("tool") == "über")
  }

  test("null and empty text are tagged, not dropped; optional captures omitted") {
    val df = Seq[(Integer, String)]((1, null), (2, "")).toDF("id", "text")
    val got = GrokStage(df, "text", GrokStage.transcriptRules)
      .select(col("id"), col("rule_id"), col("tags"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getSeq[String](2)))
    assert(got.forall { case (_, rule, tags) =>
      rule == null && tags == Seq(GrokStage.ParseErrorTag) })
    // a rule with an optional group: unmatched capture is absent from fields
    val rules = Seq(GrokRule("opt", """^x(\d+)?(y)$""", Seq("num", "tail")))
    val r = GrokStage(Seq("xy").toDF("text"), "text", rules)
      .select("fields").collect().head.getMap[String, String](0).toMap
    assert(r == Map("tail" -> "y"))
  }

  test("batch InternalRow path survives shuffles, sorts and collects intact") {
    // UTF8String slices must not alias reused scan buffers once buffered
    val t = Transcripts.load(spark, sfUnit).limit(500)
    val p = GrokStage(t, "text", GrokStage.transcriptRules)
    val sorted = p.filter(col("rule_id") === "syslog")
      .sort(col("fields")("host"), col("conv_id"), col("turn_idx"))
      .select(col("fields")("host").as("h"), col("text"))
      .as[(String, String)].collect()
    assert(sorted.nonEmpty)
    assert(sorted.forall { case (h, text) => text.contains(h) }) // no cross-row smearing
    assert(sorted.map(_._1).toSeq == sorted.map(_._1).sorted.toSeq)
  }

  test("full corpus: every non-garbage line parses, garbage is tagged") {
    val t = Transcripts.load(spark, sfUnit)
    val p = GrokStage(t, "text", GrokStage.transcriptRules).cache()
    val err = p.filter(array_contains(col("tags"), GrokStage.ParseErrorTag))
    assert(err.filter(!col("text").startsWith("~~CORRUPT")).count() == 0)
    assert(p.filter(col("rule_id").isNull && !array_contains(col("tags"), GrokStage.ParseErrorTag)).count() == 0)
    assert(p.count() == t.count()) // nothing dropped
    p.unpersist()
  }
}
