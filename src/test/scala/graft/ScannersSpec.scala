package graft

import org.apache.spark.sql.functions._
import graft.parsers.Scanners
import graft.parsers.Scanners._

/** Ported cases from reference lib/scanner/kv-scanner/tests/
  * test_kv_scanner.c and modules/csvparser/tests + lib/scanner/csv-scanner
  * semantics.
  */
class ScannersSpec extends SparkSpec {
  import spark.implicits._

  private def kv(s: String, o: KvOptions = KvOptions()): Seq[(String, String)] =
    Scanners.scanKv(s, o)._1

  private def kvStray(s: String): (Seq[(String, String)], String) =
    Scanners.scanKv(s, KvOptions(extractStrayWords = true))

  test("kv: basic pairs, spaces between values ignored") {
    assert(kv("key1=value1 key2=value2 key3=value3 ") ==
      Seq("key1" -> "value1", "key2" -> "value2", "key3" -> "value3"))
    assert(kv("key1=value1    key2=value2     key3=value3 ") ==
      Seq("key1" -> "value1", "key2" -> "value2", "key3" -> "value3"))
  }

  test("kv: initial stray words are ignored; with extraction they are stored") {
    assert(kv("lorem ipsum foo=bar") == Seq("foo" -> "bar"))
    assert(kv("a b c=d") == Seq("c" -> "d"))
    assert(kv("x *k=v") == Seq("k" -> "v"))
    assert(kvStray("alma foo=bar, korte bar=foo, narancs") ==
      (Seq("foo" -> "bar", "bar" -> "foo"), "alma,korte,narancs"))
  }

  test("kv: non-initial stray words are added to the last value") {
    assert(kv("foo=bar lorem ipsum key=value some more values") ==
      Seq("foo" -> "bar lorem ipsum", "key" -> "value some more values"))
    assert(kv("foo=bar ggg") == Seq("foo" -> "bar ggg"))
    assert(kv("foo=bar ggg baz=ez") == Seq("foo" -> "bar ggg", "baz" -> "ez"))
  }

  test("kv: empty values in a series") {
    assert(kv("k= a=b c=d") == Seq("k" -> "", "a" -> "b", "c" -> "d"))
    assert(kv("k=v a= c=d") == Seq("k" -> "v", "a" -> "", "c" -> "d"))
    assert(kv("k=v a=b c=") == Seq("k" -> "v", "a" -> "b", "c" -> ""))
  }

  test("kv: comma-space pair separator; bare comma is not a delimiter") {
    assert(kv("key1=value1, key2=value2, key3=value3") ==
      Seq("key1" -> "value1", "key2" -> "value2", "key3" -> "value3"))
    assert(kv("key1=value1,key2=value2,key3=value3") ==
      Seq("key1" -> "value1,key2=value2,key3=value3"))
  }

  test("kv: quoted values are one token; escapes decode; stray after quote") {
    assert(kv("key1=\"value foo\" key2=marker") ==
      Seq("key1" -> "value foo", "key2" -> "marker"))
    assert(kv("key1=\"value foo embedded_key=emb_value\" key2=marker") ==
      Seq("key1" -> "value foo embedded_key=emb_value", "key2" -> "marker"))
    assert(kv("key1=\"value foo\\\"\" key2=marker") ==
      Seq("key1" -> "value foo\"", "key2" -> "marker"))
    assert(kv("key1='value foo\\'' key2=marker") ==
      Seq("key1" -> "value foo'", "key2" -> "marker"))
    assert(kvStray("foo=\"bar\" baz c=d") == (Seq("foo" -> "bar", "c" -> "d"), "baz"))
  }

  test("kv: spaces trimmed around separator and key names") {
    assert(kv("foo =bar") == Seq("foo" -> "bar"))
    assert(kv("foo= bar") == Seq("foo" -> "bar"))
    assert(kv("foo =  bar ggg baz   =   ez") ==
      Seq("foo" -> "bar ggg", "baz" -> "ez"))
    assert(kv("k===  a") == Seq("k" -> "==  a"))
  }

  test("kv: single-space pair separator disables space heuristics") {
    val o = KvOptions(pairSeparator = " ")
    assert(Scanners.scanKv("foo=v1 v2 bar=v3 v4", o)._1 ==
      Seq("foo" -> "v1", "bar" -> "v3"))
  }

  // ---- CSV dialects ----
  private val names3 = 3

  test("csv: escape-none with quotes; delimiter inside quotes preserved") {
    val o = CsvOptions()
    assert(Scanners.scanCsv("a,\"b,c\",d", 3, o).toSeq == Seq("a", "b,c", "d"))
    assert(Scanners.scanCsv("a,b", 3, o) == null)       // missing column
    assert(Scanners.scanCsv("a,b,c,d", 3, o) == null)   // trailing input
  }

  test("csv: escape-double-char doubles the quote") {
    val o = CsvOptions(dialect = EscapeDoubleChar)
    assert(Scanners.scanCsv("\"a\"\"b\",c,d", 3, o).toSeq == Seq("a\"b", "c", "d"))
  }

  test("csv: escape-backslash and backslash-with-sequences") {
    val o1 = CsvOptions(dialect = EscapeBackslash)
    assert(Scanners.scanCsv("\"a\\\"b\",c,d", 3, o1).toSeq == Seq("a\"b", "c", "d"))
    val o2 = CsvOptions(dialect = EscapeBackslashWithSequences)
    assert(Scanners.scanCsv("\"a\\tb\\x41\",c,d", 3, o2).toSeq == Seq("a\tbA", "c", "d"))
  }

  test("csv: greedy last column takes the rest, including delimiters") {
    val o = CsvOptions(greedy = true)
    assert(Scanners.scanCsv("a,b,rest, with, commas", 3, o).toSeq ==
      Seq("a", "b", "rest, with, commas"))
  }

  test("csv: strip-whitespace and null-value translation") {
    val o = CsvOptions(stripWhitespace = true, nullValue = "-")
    assert(Scanners.scanCsv("  a  , - ,c", 3, o).toSeq == Seq("a", "", "c"))
  }

  test("csv: string delimiters split on multi-char sequences") {
    val o = CsvOptions(delimiters = "", stringDelimiters = Seq("||"))
    assert(Scanners.scanCsv("a||b||c", 3, o).toSeq == Seq("a", "b", "c"))
  }

  // ---- Spark stages ----
  test("csvStage: columns + invalid flag; kvStage: map + strays") {
    val df = Seq(
      "x,\"y,2\",z",
      "only,two").toDF("text")
    val got = Scanners.csvStage(df, "text", Seq("c1", "c2", "c3"), CsvOptions())
      .select("c1", "c2", "c3", "csv_invalid")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    assert(got.contains(("x", "y,2", "z", false)))
    assert(got.contains((null, null, null, true))) // flagged, not dropped

    val kvDf = Seq("boot seq msg='hello world' conv=c-1 n=2").toDF("text")
    val kvGot = Scanners.kvStage(kvDf, "text", KvOptions(extractStrayWords = true))
      .select(col("kv_fields")("msg"), col("kv_fields")("conv"), col("kv_fields")("n"), col("kv_stray"))
      .collect().head
    assert(kvGot.getString(0) == "hello world" && kvGot.getString(1) == "c-1" &&
      kvGot.getString(2) == "2" && kvGot.getString(3) == "boot seq")
  }
}
