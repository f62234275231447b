package graft.parsers

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** One grok rule: an anchored regex with positionally-named captures.
  * Mirrors the reference's db-parser() pattern rules (radix-tree dispatch in
  * reference modules/correlation/radix.c:1550): semantics are ordered
  * first-match-wins alternation with typed captures; the radix tree is only
  * a dispatch optimization, which the JVM regex alternation replaces.
  */
final case class GrokRule(id: String, pattern: String, captures: Seq[String]) {
  def compile: CompiledGrokRule =
    CompiledGrokRule(id, java.util.regex.Pattern.compile(pattern), captures.toArray)
}

final case class CompiledGrokRule(
    id: String,
    pattern: java.util.regex.Pattern,
    captures: Array[String])

/** The compiled parse stage (north star): precompiled `java.util.regex`
  * patterns applied per-partition via `mapPartitions`, first-match-wins,
  * named captures emitted into a `fields` map column, matching rule id into
  * `rule_id`, and — exactly like the reference, which tags instead of
  * dropping (reference lib/logmsg/logmsg.h:105-124 LM_T_MSG_PARSE_ERROR) —
  * a `tags` array carrying `msg.parse_error` for unmatched rows.
  *
  * Patterns are compiled once per partition (not per row); the iterator is
  * mapped lazily so the stage pipelines with the parquet scan without
  * materializing a partition. This is the analog of the reference's
  * config-time PCRE2 JIT compile (reference lib/logmatcher.c:291-345).
  */
object GrokStage {

  val FieldsType: MapType = MapType(StringType, StringType, valueContainsNull = false)
  val ParseErrorTag = "msg.parse_error"

  def apply(df: DataFrame, textCol: String, rules: Seq[GrokRule]): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField("fields", FieldsType, nullable = false))
      .add(StructField("rule_id", StringType, nullable = true))
      .add(StructField("tags", ArrayType(StringType, containsNull = false), nullable = false))
    val textIdx = inSchema.fieldIndex(textCol)
    val ruleSpecs = rules.toArray
    val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      val compiled = ruleSpecs.map(_.compile)
      val noTags = Seq.empty[String]
      val errTags = Seq(ParseErrorTag)
      it.map { row =>
        val text = row.getString(textIdx)
        var fields: Map[String, String] = null
        var ruleId: String = null
        if (text != null) {
          var i = 0
          while (i < compiled.length && ruleId == null) {
            val r = compiled(i)
            val m = r.pattern.matcher(text)
            if (m.matches()) {
              val b = Map.newBuilder[String, String]
              var g = 0
              while (g < r.captures.length) {
                val v = m.group(g + 1)
                if (v != null) b += r.captures(g) -> v
                g += 1
              }
              fields = b.result()
              ruleId = r.id
            }
            i += 1
          }
        }
        val matched = ruleId != null
        Row.fromSeq(
          row.toSeq :+ (if (matched) fields else Map.empty[String, String]) :+
            ruleId :+ (if (matched) noTags else errTags))
      }
    }(enc)
  }

  /** The engine's standard ruleset for transcript `text` lines: BSD-syslog
    * (reference modules/syslogformat/syslog-format.c), kv lines
    * (reference modules/kvformat), flat JSON event lines (reference
    * modules/json), and a CSV turn record (reference modules/csvparser).
    * Ordered: first match wins.
    */
  val transcriptRules: Seq[GrokRule] = Seq(
    GrokRule(
      "syslog",
      """^<(\d{1,3})>([A-Z][a-z]{2}) ([ \d]\d) (\d\d):(\d\d):(\d\d) (\S+) ([^:\[\s]+)\[(\d+)\]: action=(\w+) status=(\w+)$""",
      Seq("pri", "mon", "dd", "hh", "mi", "ss", "host", "prog", "pid", "action", "status")),
    GrokRule(
      "kv",
      """^event=(\S+) tool=(\S+) duration_ms=(\d+) ok=(\S+)$""",
      Seq("event", "tool", "duration_ms", "ok")),
    GrokRule(
      "json",
      """^\{"event":"([^"]*)","role":"([^"]*)","tokens":(\d+),"status":"([^"]*)"\}$""",
      Seq("event", "role", "tokens", "status")),
    GrokRule(
      "csv",
      """^(conv-\d+),(\d+),([a-z]+),(\d+)$""",
      Seq("c_conv", "c_turn", "c_role", "latency_ms")))
}
