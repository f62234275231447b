package graft.rewrite

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.model.SyslogNames

/** The reference's rewrite operators (reference lib/rewrite/) as
  * DataFrame → DataFrame projections. Every rewrite supports an optional
  * guard `condition()` (reference lib/rewrite/rewrite-expr.c:36-48): when the
  * condition is false the row passes through unchanged — `when(cond, new)
  * .otherwise(old)`, never a filter.
  */
object Rewrites {

  private def guarded(df: DataFrame, name: String, value: Column, condition: Option[Column]): DataFrame = {
    val old: Column =
      if (df.columns.contains(name)) col(name) else lit(null).cast("string")
    condition match {
      case None       => df.withColumn(name, value)
      case Some(cond) => df.withColumn(name, when(cond, value).otherwise(old))
    }
  }

  /** set(value, NAME) — reference lib/rewrite/rewrite-set.c:49. */
  def set(df: DataFrame, name: String, value: Column, condition: Option[Column] = None): DataFrame =
    guarded(df, name, value, condition)

  /** unset(NAME) — reference lib/rewrite/rewrite-unset.c:39. */
  def unset(df: DataFrame, name: String): DataFrame = df.drop(name)

  /** rename(A, B) — reference lib/rewrite/rewrite-rename.c:37. */
  def rename(df: DataFrame, from: String, to: String): DataFrame =
    df.withColumnRenamed(from, to)

  /** subst(re, replacement, NAME) — reference lib/rewrite/rewrite-subst.c:50.
    * Default = first match only; `global = true` replaces all (reference
    * subst flags(global)). Global empty matches advance like PCRE
    * (`c*`→`#a#a#`), with ONE declared divergence: after an empty match
    * PCRE retries the same offset with NOTEMPTY_ATSTART (so `b*|aa` can
    * still consume `aa` there) while java.util.regex moves one char
    * forward — test_matcher.c's `b*|aa` global case renders `@a@a@`, not
    * the reference's `@@@`.
    */
  def subst(df: DataFrame, name: String, re: String, replacement: String,
      global: Boolean = false, condition: Option[Column] = None): DataFrame = {
    val replaced =
      if (global) regexp_replace(col(name), re, replacement)
      else GraftFunctions.regexp_replace_first(col(name), re, replacement)
    guarded(df, name, replaced, condition)
  }

  /** subst() with a TEMPLATE replacement — `$0..$n` are the match's capture
    * groups (flags(store-matches)) and functions apply per match, e.g. the
    * cc-mask SCL's `$(substr $0 0 6)******$(substr $0 -4 4)` (reference
    * scl/rewrite/cc-mask.conf, rewrite-subst.c). Plain group splices stay on
    * the codegen'd [[subst]]; this path is for function-bearing templates.
    */
  def substTemplate(df: DataFrame, name: String, re: String, replacementTmpl: String,
      global: Boolean = false, condition: Option[Column] = None): DataFrame = {
    // force template validation NOW (driver, plan time) — an unsupported
    // function must not surface as a per-row executor exception
    graft.functions.MatchTemplates.compile(replacementTmpl)
    guarded(df, name,
      GraftFunctions.regexp_subst_template(col(name), re, replacementTmpl, global),
      condition)
  }

  /** groupset(value, globs) — set every column whose name matches one of the
    * glob patterns (reference lib/rewrite/rewrite-groupset.c:72). The glob is
    * resolved against the schema at plan time (the schema is the NVTable
    * registry analog).
    */
  def groupSet(df: DataFrame, globs: Seq[String], value: Column): DataFrame = {
    val regexes = globs.map(g => ("^" + g.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$").r)
    df.columns.foldLeft(df) { (acc, c) =>
      if (regexes.exists(_.findFirstIn(c).isDefined)) acc.withColumn(c, value.cast(df.schema(c).dataType))
      else acc
    }
  }

  /** set-tag(t) — reference lib/rewrite/rewrite-set-tag.c:62. */
  def setTag(df: DataFrame, tagsCol: String, tag: Column, condition: Option[Column] = None): DataFrame = {
    val added = array_union(col(tagsCol), array(tag))
    guarded(df, tagsCol, added, condition)
  }

  /** clear-tag(t). */
  def clearTag(df: DataFrame, tagsCol: String, tag: Column): DataFrame =
    df.withColumn(tagsCol, array_remove(col(tagsCol), tag))

  /** set-pri(template) — bounded 0..191 int parse, invalid values leave the
    * pri unchanged (reference lib/rewrite/rewrite-set-pri.c:58).
    */
  def setPri(df: DataFrame, priCol: String, value: Column,
      condition: Option[Column] = None): DataFrame = {
    val parsed = value.cast("string").try_cast("int")
    guarded(df, priCol,
      when(parsed.isNotNull && parsed.between(0, 191), parsed).otherwise(col(priCol)),
      condition)
  }

  /** set-severity(name-or-num) — reference rewrite-set-severity.c:84. */
  def setSeverity(df: DataFrame, priCol: String, value: Column,
      condition: Option[Column] = None): DataFrame = {
    val bySev = severityNumFromValue(value)
    guarded(df, priCol,
      when(bySev.isNotNull, SyslogNames.mkPri(SyslogNames.facilityNum(col(priCol)), bySev))
        .otherwise(col(priCol)),
      condition)
  }

  /** set-facility(name-or-num) — reference rewrite-set-facility.c:83. */
  def setFacility(df: DataFrame, priCol: String, value: Column,
      condition: Option[Column] = None): DataFrame = {
    val byFac = facilityNumFromValue(value)
    guarded(df, priCol,
      when(byFac.isNotNull, SyslogNames.mkPri(byFac, SyslogNames.severityNum(col(priCol))))
        .otherwise(col(priCol)),
      condition)
  }

  /** Severity aliases (lib/severity-aliases.table): panic/emergency → 0,
    * fatal/ftl → 2, warn/wrn → 4, log/inf → 6, dbg/vrb/trace → 7 …
    */
  private val severityAliases: Seq[(String, Int)] =
    SyslogNames.severities.zipWithIndex ++ Seq(
      "emergency" -> 0, "panic" -> 0, "critical" -> 2, "fatal" -> 2,
      "ftl" -> 2, "error" -> 3, "warn" -> 4, "wrn" -> 4, "inf" -> 6,
      "log" -> 6, "dbg" -> 7, "vrb" -> 7, "trace" -> 7)

  private def severityNumFromValue(v: Column): Column = {
    val byName = severityAliases.foldLeft(lit(null).cast("int")) {
      case (acc, (n, i)) => when(lower(v.cast("string")) === n, lit(i)).otherwise(acc)
    }
    val num = v.cast("string").try_cast("int")
    when(num.isNotNull && num.between(0, 7), num).otherwise(byName)
  }

  private def facilityNumFromValue(v: Column): Column = {
    val byName = SyslogNames.facilities.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (n, i)) => when(lower(v.cast("string")) === n, lit(i)).otherwise(acc)
    }
    val num = v.cast("string").try_cast("int")
    when(num.isNotNull && num.between(0, 23), num).otherwise(byName)
  }

  /** store-matches: capture groups of `re` against `value` into a $0..$n
    * matches array (reference lib/logmatcher.c:73-119); $0 is the whole
    * match like the reference.
    */
  def storeMatches(df: DataFrame, matchesCol: String, value: Column, re: String): DataFrame =
    df.withColumn(matchesCol,
      when(value.rlike(re), regexp_extract_all(value, lit("(" + re + ")"), lit(0)))
        .otherwise(array().cast("array<string>")))

  /** set-matches(v0, v1, …) — overwrite the matches array wholesale
    * (reference lib/rewrite/rewrite-set-matches.c).
    */
  def setMatches(df: DataFrame, matchesCol: String, values: Seq[Column]): DataFrame =
    df.withColumn(matchesCol, array(values.map(_.cast("string")): _*))

  /** unset-matches — clear it (rewrite-unset-matches.c). */
  def unsetMatches(df: DataFrame, matchesCol: String): DataFrame =
    df.withColumn(matchesCol, array().cast("array<string>"))

  /** set-time-zone (reference modules/timestamp/rewrite-set-timezone.c):
    * CONVERT the instant into another zone's wall clock.
    */
  def setTimeZone(df: DataFrame, tsCol: String, fromTz: String, toTz: String): DataFrame =
    df.withColumn(tsCol, convert_timezone(lit(fromTz), lit(toTz), col(tsCol)))

  /** fix-time-zone (reference modules/timestamp/rewrite-fix-timezone.c):
    * the wall-clock digits were right but stamped in the wrong zone —
    * KEEP the wall clock, reinterpret it as `realTz` (so the underlying
    * instant shifts). Distinct from set-time-zone, which keeps the
    * instant and changes the wall clock.
    */
  def fixTimeZone(df: DataFrame, tsCol: String, realTz: String): DataFrame =
    df.withColumn(tsCol,
      to_utc_timestamp(col(tsCol).cast("timestamp_ntz").cast("timestamp"), realTz))

  /** guess-time-zone (reference modules/timestamp/rewrite-guess-timezone.c
    * via timeutils/zoneinfo guess): pick, from a candidate zone list, the
    * zone whose reinterpretation of the event wall clock lands closest to
    * the receive time — recovers the sender's zone when devices stamp
    * local time without an offset. Pure expression: one candidate struct
    * per zone, array_min on |Δ| with the zone name as tiebreak.
    */
  def guessTimeZone(df: DataFrame, tsCol: String, recvTs: Column,
      candidateZones: Seq[String]): DataFrame = {
    val wall = col(tsCol).cast("timestamp_ntz").cast("timestamp")
    val cands = array(candidateZones.map { z =>
      val fixed = to_utc_timestamp(wall, z)
      struct(
        abs(unix_timestamp(fixed) - unix_timestamp(recvTs)).as("delta"),
        lit(z).as("zone"),
        fixed.as("fixed"))
    }: _*)
    val best = array_min(cands)
    // one withColumns: both outputs must see the ORIGINAL tsCol (a second
    // withColumn would re-derive `best` over the already-rewritten column)
    df.withColumns(Map(
      tsCol -> best.getField("fixed"),
      s"${tsCol}_zone" -> best.getField("zone")))
  }

  // --- value-pairs scopes + key transforms (reference lib/value-pairs/) ---

  /** Named scopes (reference lib/value-pairs/value-pairs.c:71-137 VPS_*)
    * mapped onto the transcript frame's columns: each scope is the glob
    * set it selects. `nv-pairs` / `sdata` address the dynamic `fields` map
    * via [[valuePairsWithFields]]; the rest select schema columns.
    */
  val Scopes: Map[String, Seq[String]] = Map(
    "rfc3164" -> Seq("host", "prog", "pid", "text", "ts", "pri"),
    "rfc5424" -> Seq("host", "prog", "pid", "text", "ts", "pri", "msgid", "sdata_*"),
    "all-macros" -> Seq("host", "prog", "pid", "text", "ts", "pri", "tags", "rule_id"),
    "selected-macros" -> Seq("host", "prog", "pid", "ts", "pri"),
    "everything" -> Seq("*"))

  /** Key transforms (reference lib/value-pairs/transforms.c:53-103):
    * declarative so they apply both to schema column names (driver side)
    * and to dynamic map keys (as codegen'd expressions - no UDF).
    */
  sealed trait KeyTransform {
    def apply(k: String): String
    def expr(k: Column): Column
  }
  /** shift(n): drop the first n chars of every key. */
  final case class Shift(n: Int) extends KeyTransform {
    def apply(k: String): String = k.drop(n)
    def expr(k: Column): Column = substring(k, n + 1, Int.MaxValue)
  }
  /** replace-prefix(from, to). */
  final case class ReplacePrefix(from: String, to: String) extends KeyTransform {
    def apply(k: String): String =
      if (k.startsWith(from)) to + k.substring(from.length) else k
    def expr(k: Column): Column =
      when(k.startsWith(from), concat(lit(to), substring(k, from.length + 1, Int.MaxValue)))
        .otherwise(k)
  }
  /** add-prefix(p). */
  final case class AddPrefix(p: String) extends KeyTransform {
    def apply(k: String): String = p + k
    def expr(k: Column): Column = concat(lit(p), k)
  }

  /** value-pairs with named scopes: scopes expand to their glob sets,
    * explicit globs add on top, transforms compose left-to-right.
    */
  def valuePairsScoped(df: DataFrame, scopes: Seq[String],
      includeGlobs: Seq[String] = Nil, excludeGlobs: Seq[String] = Nil,
      transforms: Seq[KeyTransform] = Nil): Column = {
    val globs = scopes.flatMap(sc =>
      Scopes.getOrElse(sc, sys.error(s"unknown value-pairs scope: $sc"))) ++ includeGlobs
    valuePairs(df, globs, excludeGlobs,
      k => transforms.foldLeft(k)((acc, t) => t(acc)))
  }

  /** The `nv-pairs` / `sdata` scopes: merge the dynamic parsed `fields`
    * map under the scoped selection (parsed name-values are the reference's
    * NV-pairs). Schema columns win name collisions, like the reference's
    * hard-macro precedence; map keys transform via pure expressions.
    */
  def valuePairsWithFields(df: DataFrame, scopes: Seq[String], fields: Column,
      transforms: Seq[KeyTransform] = Nil): Column = {
    val transformed = transform_keys(fields,
      (k, _) => transforms.foldLeft(k)((acc, t) => t.expr(acc)))
    val scoped = valuePairsScoped(df, scopes, transforms = transforms)
    // schema-wins on collisions: map_concat under the default
    // mapKeyDedupPolicy=EXCEPTION would throw DUPLICATED_MAP_KEY when a
    // parsed field name matches a scoped column — filter those out first
    map_concat(
      map_filter(transformed, (k, _) => !array_contains(map_keys(scoped), k)),
      scoped)
  }

  /** map-value-pairs / column-glob selection helper (reference
    * lib/value-pairs): build a map column from schema columns selected by
    * glob with optional key transforms (add-prefix, upper, lower).
    */
  def valuePairs(df: DataFrame, includeGlobs: Seq[String], excludeGlobs: Seq[String] = Nil,
      keyTransform: String => String = identity): Column = {
    def toRe(g: String) = ("^" + g.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$").r
    val inc = includeGlobs.map(toRe)
    val exc = excludeGlobs.map(toRe)
    val selected = df.columns.filter(c =>
      inc.exists(_.findFirstIn(c).isDefined) && !exc.exists(_.findFirstIn(c).isDefined))
    map(selected.flatMap(c => Seq(lit(keyTransform(c)), col(c).cast("string"))): _*)
  }
}
