package graft

import org.apache.spark.sql.functions._

import graft.parsers.FieldParsers

/** Expression-based parser details not covered by the oracle queries. */
class FieldParsersSpec extends SparkSpec {
  import spark.implicits._

  test("rfc5424: multiple SDATA elements, params keyed id.param") {
    val line = """<165>1 2026-03-05T06:07:08.000Z h app 77 ID1 [ex@1 a="1" b="x y"][other@2 c="3"] the msg"""
    val r = Seq(line).toDF("l")
      .select(FieldParsers.rfc5424Parser(col("l")).as("r"))
      .select(col("r.pri"), col("r.host"), col("r.sdata_ids"), col("r.sdata"), col("r.msg"))
      .collect().head
    assert(r.getInt(0) === 165 && r.getString(1) === "h")
    assert(r.getSeq[String](2) === Seq("ex@1", "other@2"))
    assert(r.getMap[String, String](3).toMap ===
      Map("ex@1.a" -> "1", "ex@1.b" -> "x y", "other@2.c" -> "3"))
    assert(r.getString(4) === "the msg")
  }

  test("rfc5424: NILVALUE fields and no-SDATA form") {
    val line = """<13>1 2026-03-05T06:07:08.000Z - - - - - hello"""
    val r = Seq(line).toDF("l")
      .select(FieldParsers.rfc5424Parser(col("l")).as("r"))
      .select(col("r.host"), col("r.app"), col("r.sdata_id"), col("r.msg"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getString(3) === "hello")
  }

  test("audit parser: even-length uppercase hex values decode, others pass") {
    val got = Seq("type=EXEC cmd=6C73202D6C msg=plain n=123")
      .toDF("l").select(FieldParsers.auditParser(col("l")).as("m"))
      .as[Map[String, String]].head()
    assert(got === Map("type" -> "EXEC", "cmd" -> "ls -l", "msg" -> "plain", "n" -> "123"))
  }

  test("date parser: ordered format fallback") {
    val got = Seq("2026/03/05 06:07", "05-Mar-2026 06:07", "garbage")
      .toDF("s")
      .select(FieldParsers.dateParser(col("s"),
        Seq("yyyy/MM/dd HH:mm", "dd-MMM-yyyy HH:mm")).cast("string"))
      .as[String].collect()
    assert(got(0) === "2026-03-05 06:07:00" && got(1) === "2026-03-05 06:07:00")
    assert(got(2) == null)
  }

  test("jsonFlatten: dotted columns, prefix, extract-prefix") {
    val df = Seq("""{"a":{"b":7,"c":"s"},"d":"x"}""").toDF("j")
    val flat = graft.parsers.FieldParsers.jsonFlatten(
      df, col("j"), "a STRUCT<b: INT, c: STRING>, d STRING")
    assert(flat.select(col("`a.b`"), col("`a.c`"), col("d"))
      .as[(Int, String, String)].head() == ((7, "s", "x")))
    val pref = graft.parsers.FieldParsers.jsonFlatten(
      df, col("j"), "a STRUCT<b: INT, c: STRING>, d STRING", prefix = ".json.")
    assert(pref.columns.count(_.startsWith(".json.")) === 3)
    val sub = graft.parsers.FieldParsers.jsonFlatten(
      df, col("j"), "a STRUCT<b: INT, c: STRING>, d STRING",
      extractPrefix = Some("a"))
    assert(sub.select("b", "c").as[(Int, String)].head() == ((7, "s")))
  }
}
