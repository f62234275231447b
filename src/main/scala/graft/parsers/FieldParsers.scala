package graft.parsers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Expression-based pipeline parsers (reference `parser {}` blocks,
  * SURVEY.md §2.3) — each takes an input column (default `$MESSAGE` analog:
  * the `text` column) and produces typed columns. All pure Catalyst
  * expressions: codegen'd, pushdown-friendly, no UDFs.
  */
object FieldParsers {

  /** csv-parser(): split into named, typed columns (reference
    * modules/csvparser/csvparser.c:277). `prefix` maps to column-name
    * prefixing; type errors under the reference's on-type-error drop policy
    * map to try_cast nulls.
    */
  def csvParser(df: DataFrame, input: Column, names: Seq[String],
      delimiter: String = ",", prefix: String = ""): DataFrame = {
    val parts = split(input, java.util.regex.Pattern.quote(delimiter))
    names.zipWithIndex.foldLeft(df) { case (acc, (n, i)) =>
      acc.withColumn(prefix + n, element_at(parts, i + 1))
    }
  }

  /** csv with a quoted dialect — use Spark's from_csv (full RFC quoting). */
  def csvParserQuoted(input: Column, schemaDdl: String): Column =
    from_csv(input, StructType.fromDDL(schemaDdl), Map.empty[String, String])

  /** kv-parser(): key=value scan → MapType column (reference
    * modules/kvformat/kv-parser.c:104). `str_to_map` matches the scanner for
    * space-separated unquoted pairs; value-separator/pair-separator are
    * configurable like the reference.
    */
  def kvParser(input: Column, pairSep: String = " ", kvSep: String = "="): Column =
    str_to_map(input, lit(pairSep), lit(kvSep))

  /** json-parser(): JSON → typed struct via schema-on-read (reference
    * modules/json/json-parser.c:329). Dotted-column flattening is the
    * caller's `select(col("j.*"))` — or [[jsonFlatten]] for the full
    * prefix()/extract-prefix() surface.
    */
  def jsonParser(input: Column, schemaDdl: String): Column =
    from_json(input, StructType.fromDDL(schemaDdl))

  /** json-parser(prefix(), extract-prefix()) (reference
    * modules/json/json-parser.c:70-120): nested objects flatten into
    * dotted top-level columns `prefix + a.b.c`; `extractPrefix` first
    * descends to that subtree and flattens only it. Pure projection —
    * one from_json, columns pruned by Catalyst when unused.
    */
  def jsonFlatten(df: DataFrame, input: Column, schemaDdl: String,
      prefix: String = "", extractPrefix: Option[String] = None): DataFrame = {
    val schema = StructType.fromDDL(schemaDdl)
    val parsed = from_json(input, schema)
    val (root, rootType: DataType) = extractPrefix match {
      case None => (parsed, schema)
      case Some(p) =>
        p.split("\\.").foldLeft((parsed, schema: DataType)) {
          case ((c, st: StructType), name) => (c(name), st(name).dataType)
          case _ => sys.error(s"extract-prefix $p does not address a struct")
        }
    }
    def flat(c: Column, t: DataType, path: String): Seq[(String, Column)] = t match {
      case s: StructType =>
        s.fields.toSeq.flatMap(f =>
          flat(c(f.name), f.dataType, if (path.isEmpty) f.name else s"$path.${f.name}"))
      case _ => Seq(path -> c)
    }
    val cols = rootType match {
      case s: StructType => flat(root, s, "")
      case _             => Seq("" -> root)
    }
    // one projection: a withColumn per leaf re-analyzes the plan per column
    df.withColumns(cols.map { case (p, c) => (prefix + p) -> c }.toMap)
  }

  /** date-parser(): strptime with a format list — first format that parses
    * wins (reference modules/timestamp/date-parser.c:105-137). Uses
    * try_to_timestamp per format + coalesce, exactly the reference's ordered
    * fallback.
    */
  def dateParser(input: Column, formats: Seq[String]): Column =
    coalesce(formats.map(f => try_to_timestamp(input, lit(f))): _*)

  /** BSD-syslog (RFC3164) timestamp: `Mon dd HH:mm:ss` has no year — the
    * reference guesses from the received time (scan-timestamp.c); we take an
    * explicit reference year (determinism).
    */
  def syslogTimestamp(mon: Column, dd: Column, hh: Column, mi: Column,
      ss: Column, year: Int): Column = {
    val monNum = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
      "Sep", "Oct", "Nov", "Dec").zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (acc, (m, i)) =>
        when(mon === m, lit(i + 1)).otherwise(acc)
      }
    make_timestamp(lit(year), monNum, dd.cast("int"), hh.cast("int"),
      mi.cast("int"), ss.cast("decimal(16,6)"))
  }

  /** tags-parser(): parse `$TAGS`-formatted comma list back into an array
    * (reference modules/tagsparser/tags-parser.c:37).
    */
  def tagsParser(input: Column): Column =
    filter(split(input, ","), t => t =!= "")

  /** RFC5424 syslog parser (reference modules/syslogformat/syslog-format.c:
    * 530-777): `<PRI>VERSION TS HOST APP PROCID MSGID SDATA [MSG]`.
    * Returns a struct; SDATA `[id k="v" ...]` yields the element id and a
    * params map — the caller prefixes them `.SDATA.<id>.<k>` like the
    * reference's dotted columns. NILVALUE `-` becomes null.
    */
  def rfc5424Parser(input: Column): Column = {
    // SDATA is one or more [id k="v" ...] elements, or NILVALUE
    val re = "^<(\\d{1,3})>(\\d+) (\\S+) (\\S+) (\\S+) (\\S+) (\\S+) ((?:\\[[^\\]]*\\])+|-)(?: (.*))?$"
    def g(i: Int): Column = regexp_extract(input, re, i)
    def nilable(c: Column): Column = when(c === "-" || c === "", null).otherwise(c)
    val sd = g(8)
    val sdPresent = sd.startsWith("[")
    struct(
      g(1).cast("int").as("pri"),
      g(2).cast("int").as("version"),
      try_to_timestamp(g(3), lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")).as("ts"),
      nilable(g(4)).as("host"),
      nilable(g(5)).as("app"),
      nilable(g(6)).as("procid"),
      nilable(g(7)).as("msgid"),
      // element ids in order; params of ALL elements keyed `id.param`
      // (the reference's dotted `.SDATA.id.param` columns)
      when(sdPresent, regexp_extract_all(sd, lit("\\[([^ \\]]+)"), lit(1)))
        .as("sdata_ids"),
      when(sdPresent, regexp_extract(sd, "^\\[([^ \\]]+)", 1)).as("sdata_id"),
      when(sdPresent, map_from_arrays(
        zip_with(
          // element id repeated for each of its params: re-scan per pair by
          // matching "id ... key=" pairs — simple two-pass: keys and the
          // element each key belongs to
          sdataKeyOwners(sd),
          regexp_extract_all(sd, lit("(\\w+)=\"[^\"]*\""), lit(1)),
          (owner, k) => concat(owner, lit("."), k)),
        regexp_extract_all(sd, lit("\\w+=\"([^\"]*)\""), lit(1)))).as("sdata"),
      nilable(g(9)).as("msg"))
  }

  /** For each `key="value"` occurrence in an SDATA string, the id of the
    * element it belongs to (elements are `[id ...]...[id2 ...]`): split on
    * `[`, each piece contributes its id once per contained pair.
    */
  private def sdataKeyOwners(sd: Column): Column = {
    val elems = filter(split(sd, "\\["), e => e =!= "")
    flatten(transform(elems, e => {
      val id = regexp_extract(e, "^([^ \\]]+)", 1)
      val nPairs = size(regexp_extract_all(e, lit("(\\w+)=\"[^\"]*\""), lit(1)))
      // sequence(1, 0) counts DOWN — param-less elements contribute nothing
      when(nPairs >= 1, transform(sequence(lit(1), nPairs), _ => id))
        .otherwise(array())
    }))
  }

  /** linux-audit-parser (reference modules/kvformat/linux-audit-parser.c):
    * kv scan where unquoted all-hex values are hex-encoded strings —
    * decoded back to UTF-8.
    */
  def auditParser(input: Column, pairSep: String = " ", kvSep: String = "="): Column =
    transform_values(kvParser(input, pairSep, kvSep), (_, v) =>
      when(v.rlike("^(?:[0-9A-F]{2})+$"), decode(unhex(v), "UTF-8")).otherwise(v))

  /** xml-parser() (reference modules/xml/xml.c:100-128): XML → typed struct
    * via Spark 4's native from_xml; attributes surface with the standard
    * `_` prefix (the reference's dotted `.xml` columns analog).
    */
  def xmlParser(input: Column, schemaDdl: String): Column =
    from_xml(input, StructType.fromDDL(schemaDdl), Map.empty[String, String].asJava)
}
