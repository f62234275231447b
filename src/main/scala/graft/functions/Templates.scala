package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's template language compiled to Catalyst expressions.
  *
  * Templates `"$HOST ${field:-default} $(func a b)"` compile to a list of
  * literal/value-ref/function elements (reference lib/template/compiler.c:
  * 151-195, templates.c:193) and evaluate per message to a string
  * (lib/template/eval.c:126-244). Here a template compiles to exactly a
  * `concat(...)` Column tree — the reference's "trivial template"
  * short-circuit (templates.c:56-104) falls out naturally: a bare `$NAME`
  * compiles to a bare column read.
  *
  * Unset values render as the empty string, `${NAME:-default}` substitutes
  * the default — both via `coalesce`, matching the reference's eval
  * semantics. `$$` escapes a dollar.
  */
object Templates {

  sealed trait Elem
  final case class Lit(s: String) extends Elem
  final case class Ref(name: String, default: Option[Seq[Elem]]) extends Elem
  /** `raw` keeps each argument's source text (quotes stripped) — condition
    * arguments of $(if)/$(grep)/$(filter) re-parse it with the filter
    * expression grammar instead of the template grammar.
    */
  final case class Call(fn: String, args: Seq[Seq[Elem]], raw: Seq[String] = Nil) extends Elem

  /** Value/macro resolution: given a name, a Column or None (unset). */
  type Resolver = String => Option[Column]

  // ------------------------------------------------------------------ parse

  /** Recursive-descent parse of the template text (the reference's
    * log_template_compile, lib/template/compiler.c).
    */
  def parse(tmpl: String): Seq[Elem] = {
    val (elems, rest) = parseElems(tmpl, 0, stopAt = Set.empty)
    require(rest == tmpl.length, s"template parse error at offset $rest in: $tmpl")
    elems
  }

  // unbraced $NAME: alnum + underscore only (dotted names need ${braces},
  // as in the reference's macro lexer); function names also allow - and .
  private val nameChar = (c: Char) => c.isLetterOrDigit || c == '_'
  private val fnNameChar = (c: Char) => c.isLetterOrDigit || c == '_' || c == '-' || c == '.'

  /** Parse until EOF or an unescaped char in stopAt at depth 0. */
  private def parseElems(s: String, start: Int, stopAt: Set[Char]): (Seq[Elem], Int) = {
    val out = Seq.newBuilder[Elem]
    val lit = new StringBuilder
    var i = start
    def flush(): Unit = if (lit.nonEmpty) { out += Lit(lit.toString); lit.clear() }
    while (i < s.length && !stopAt.contains(s(i))) {
      val c = s(i)
      if (c == '$' && i + 1 < s.length) {
        s(i + 1) match {
          case '$' => lit += '$'; i += 2
          case '{' =>
            flush()
            val close = s.indexOf('}', i + 2)
            require(close > 0, s"unterminated $${ in: $s")
            val body = s.substring(i + 2, close)
            val (name, dflt) = body.indexOf(":-") match {
              case -1 => (body, None)
              case k  => (body.take(k), Some(parse(body.drop(k + 2))))
            }
            out += Ref(name, dflt)
            i = close + 1
          case '(' =>
            flush()
            val (call, next) = parseCall(s, i + 2)
            // $(fn …)@N — index into the call's LIST result (the reference's
            // context-index suffix, e.g. $(grep cond $PID)@0 = first match)
            if (next < s.length && s(next) == '@' &&
              next + 1 < s.length && s(next + 1).isDigit) {
              var j = next + 1
              while (j < s.length && s(j).isDigit) j += 1
              out += Call("__at", Seq(Seq(call), Seq(Lit(s.substring(next + 1, j)))),
                Seq("", s.substring(next + 1, j)))
              i = j
            } else {
              out += call
              i = next
            }
          case '*' => // $* — the match list as a LIST value (macros.c M__ASTERISK)
            flush(); out += Ref("*", None); i += 2
          case c2 if nameChar(c2) =>
            flush()
            var j = i + 1
            while (j < s.length && nameChar(s(j))) j += 1
            out += Ref(s.substring(i + 1, j), None)
            i = j
          case _ => lit += c; i += 1
        }
      } else { lit += c; i += 1 }
    }
    flush()
    (out.result(), i)
  }

  /** Parse `name arg arg ...)` starting after `$(`. Args are whitespace-
    * separated; quoted args keep spaces; an arg opening with `(` runs to
    * its matching close paren (the reference's function-call tokenizer
    * groups balanced parens — `$(grep ('$F' eq 'x') $PID)`); args are
    * themselves templates; nested `$(...)` calls are supported.
    */
  private def parseCall(s: String, start: Int): (Call, Int) = {
    var i = start
    while (i < s.length && fnNameChar(s(i))) i += 1
    // operator-named functions ($(+ 1 2), $(% a b), …): a symbol run
    if (i == start) while (i < s.length && !s(i).isWhitespace && s(i) != ')') i += 1
    val fn = s.substring(start, i)
    val args = Seq.newBuilder[Seq[Elem]]
    val raws = Seq.newBuilder[String]
    while (i < s.length && s(i) != ')') {
      if (s(i).isWhitespace) i += 1
      else if (s(i) == '"' || s(i) == '\'') {
        val q = s(i)
        val close = s.indexOf(q, i + 1)
        require(close > 0, s"unterminated quote in: $s")
        val r = s.substring(i + 1, close)
        args += parse(r); raws += r
        i = close + 1
      } else if (s(i) == '(') {
        // balanced-paren group as ONE argument (quote-aware depth scan)
        var depth = 0
        var j = i
        while (j < s.length && (depth > 0 || j == i)) {
          s(j) match {
            case '"' | '\'' =>
              val close = s.indexOf(s(j), j + 1)
              require(close > 0, s"unterminated quote in: $s")
              j = close
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          j += 1
        }
        require(depth == 0, s"unbalanced parens in: $s")
        val r = s.substring(i, j)
        args += parse(r); raws += r
        i = j
      } else if (s(i) == '$' && i + 1 < s.length && s(i + 1) == '(') {
        val (call, next) = parseCall(s, i + 2)
        args += Seq(call); raws += s.substring(i, next)
        i = next
      } else {
        // bare token: runs to whitespace or ')' at paren depth 0, so call
        // forms like `program("x" type(pcre))` stay ONE argument
        val j0 = i
        var depth = 0
        while (i < s.length && !(depth == 0 && (s(i).isWhitespace || s(i) == ')'))) {
          s(i) match {
            case '"' | '\'' =>
              val close = s.indexOf(s(i), i + 1)
              require(close > 0, s"unterminated quote in: $s")
              i = close
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          i += 1
        }
        val r = s.substring(j0, i)
        args += parse(r); raws += r
      }
    }
    require(i < s.length, s"unterminated $$( in: $s")
    (Call(fn, args.result(), raws.result()), i + 1)
  }

  // ---------------------------------------------------------------- compile

  /** One compiled function argument: its Column, plus the literal text if
    * the arg is static (functions like substr/padding need plan-time ints)
    * and the raw source text (condition args re-parse it as a filter
    * expression).
    */
  final case class Arg(elems: Seq[Elem], resolver: Resolver,
      user: Map[String, String] = Map.empty, raw: String = "") {
    lazy val col: Column = compileElems(elems, resolver, user)
    def literal: Option[String] = elems match {
      case Seq(Lit(s)) => Some(s)
      case Seq()       => Some("")
      case _           => None
    }
    def int: Int = literal
      .getOrElse(sys.error("static integer arg required")).trim.toInt
  }

  /** Compile a template to one Column. `user` is the config's named
    * `template NAME {…}` registry — each name is callable as `$(NAME)`
    * (the reference's user template functions, lib/template/user-function.c:
    * a user function takes NO arguments and expands its template against
    * the same message). Builtins shadow user names.
    */
  def compile(tmpl: String, resolver: Resolver,
      user: Map[String, String] = Map.empty): Column =
    compileElems(parse(tmpl), resolver, user)

  private[functions] def compileElems(elems: Seq[Elem], resolver: Resolver,
      user: Map[String, String] = Map.empty,
      inProgress: Set[String] = Set.empty): Column = {
    val cols = elems.map {
      case Lit(s) => lit(s)
      case Ref(name, dflt) =>
        val base = resolver(name).map(_.cast("string"))
        val fallback = dflt.map(d => compileElems(d, resolver, user)).getOrElse(lit(""))
        base.map(c => coalesce(c, fallback)).getOrElse(fallback)
      case Call("template", args, raw) if args.nonEmpty =>
        compileTfTemplate(args.zip(raw.padTo(args.length, ""))
          .map { case (a, r) => Arg(a, resolver, user, r) }, resolver, user, inProgress)
      case Call(fn, args, raw) =>
        TemplateFunctions.registry.get(fn) match {
          case Some(f) =>
            coalesce(f(args.zip(raw.padTo(args.length, ""))
              .map { case (a, r) => Arg(a, resolver, user, r) }).cast("string"), lit(""))
          case None if user.contains(fn) =>
            require(args.isEmpty,
              s"user defined template function $$($fn) cannot have arguments")
            require(!inProgress(fn), s"recursive user template: $$($fn)")
            compileElems(parse(user(fn)), resolver, user, inProgress + fn)
          case None => sys.error(s"unknown template function: $$($fn)")
        }
    }
    cols match {
      case Seq()  => lit("")
      case Seq(c) => c
      case many   => concat(many: _*)
    }
  }

  /** `$(template NAME …)` (modules/basicfuncs/tf-template.c): static binding
    * when NAME is a plain literal — compile-time lookup in the config's
    * template registry, unknown name is an error; dynamic binding when NAME
    * contains a '$' — the rendered name dispatches per row over the
    * registered templates, and the remaining arguments space-joined are the
    * lookup-miss fallback.
    */
  private def compileTfTemplate(args: Seq[Arg], resolver: Resolver,
      user: Map[String, String], inProgress: Set[String]): Column = {
    val name = args.head
    name.literal match {
      case Some(n) =>
        require(user.contains(n),
          s"$$(template) Unknown template function or template \"$n\"")
        require(!inProgress(n), s"recursive user template: $$($n)")
        compileElems(parse(user(n)), resolver, user, inProgress + n)
      case None =>
        val nameCol = name.col
        val fallback =
          if (args.length < 2) lit("")
          else concat_ws(" ", args.tail.map(_.col): _*)
        user.foldLeft(fallback) {
          case (acc, (n, _)) if inProgress(n) => acc
          case (acc, (n, t)) =>
            when(nameCol === lit(n),
              compileElems(parse(t), resolver, user, inProgress + n)).otherwise(acc)
        }
    }
  }

  // --------------------------------------------------------------- resolver

  /** The full per-timestamp macro family (reference lib/template/macros.c:
    * 338-445 date branch): formats transliterated from
    * append_format_wall_clock_time (lib/timeutils/format.c:92-160 — BSD
    * stamps space-pad the day; WEEK and MONTH_WEEK use the reference's own
    * formulas, not strftime's %U/%W).
    */
  def dateMacros(t: Column): Map[String, Column] = {
    val yday0 = dayofyear(t) - 1
    val wday0 = dayofweek(t) - 1 // 0 = Sunday, like struct tm
    val bsd = concat(date_format(t, "MMM "),
      lpad(dayofmonth(t).cast("string"), 2, " "), lit(" "),
      date_format(t, "HH:mm:ss"))
    Map(
      "DATE" -> bsd,
      "STAMP" -> bsd, // default ts-format() is the BSD stamp
      "ISODATE" -> date_format(t, "yyyy-MM-dd'T'HH:mm:ssxxx"),
      "FULLDATE" -> concat(date_format(t, "yyyy MMM "),
        lpad(dayofmonth(t).cast("string"), 2, " "), lit(" "),
        date_format(t, "HH:mm:ss")),
      "YEAR" -> date_format(t, "yyyy"),
      "YEAR_DAY" -> lpad(dayofyear(t).cast("string"), 3, "0"),
      "MONTH" -> date_format(t, "MM"),
      "MONTH_WEEK" -> (floor(dayofmonth(t) / 7).cast("int") +
        when(wday0 > 0 && pmod(dayofmonth(t), lit(7)) >= wday0, 1).otherwise(0))
        .cast("string"),
      "MONTH_ABBREV" -> date_format(t, "MMM"),
      "MONTH_NAME" -> date_format(t, "MMMM"),
      "DAY" -> date_format(t, "dd"),
      "HOUR" -> date_format(t, "HH"),
      "HOUR12" -> date_format(t, "hh"),
      "MIN" -> date_format(t, "mm"),
      "SEC" -> date_format(t, "ss"),
      "MSEC" -> date_format(t, "SSS"),
      "USEC" -> date_format(t, "SSSSSS"),
      "AMPM" -> date_format(t, "a"),
      "WEEKDAY" -> date_format(t, "EEE"), // deprecated alias
      "WEEK_DAY" -> dayofweek(t).cast("string"), // 1 = Sunday
      "WEEK_DAY_ABBREV" -> date_format(t, "EEE"),
      "WEEK_DAY_NAME" -> date_format(t, "EEEE"),
      "WEEK" -> lpad(floor((yday0 - pmod(wday0 - 1 + 7, lit(7)) + 7) / 7)
        .cast("int").cast("string"), 2, "0"),
      "ISOWEEK" -> lpad(weekofyear(t).cast("string"), 2, "0"),
      "TZOFFSET" -> date_format(t, "xxx"),
      "TZ" -> date_format(t, "xxx"),
      "UNIXTIME" -> unix_timestamp(t).cast("string"))
  }

  /** The standard macro resolver over a parsed transcript frame — the ≈180
    * macro names of reference lib/template/macros.c:49-280: identity macros
    * from grok fields, pri-derived FACILITY/SEVERITY/TAG/BSDTAG, MSGHDR,
    * the socket-address family (deterministic loopback defaults, like a
    * local source in the reference), and the full date family on four time
    * bases — unprefixed + S_ (the message stamp), R_ (received), C_ and P_
    * (processed; in a deterministic batch engine "now" is the processing
    * time column, so C_* ≡ P_* — declared divergence from wall-clock now).
    * Unknown names fall back to top-level columns then the `fields` map.
    */
  def standardResolver(
      columns: Set[String],
      ts: Column,
      pri: Column,
      fields: Column,
      recvTs: Option[Column] = None,
      procTs: Option[Column] = None,
      loghost: String = "localhost",
      seqNum: Option[Column] = None): Resolver = {
    val rTs = recvTs.getOrElse(ts)
    val pTs = procTs.getOrElse(rTs)
    val facLetters = typedlit(('A' to 'X').map(_.toString))
    val dS = dateMacros(ts)
    val dR = dateMacros(rTs)
    val dP = dateMacros(pTs)
    val dates =
      dS ++
        dS.map { case (k, v) => s"S_$k" -> v } ++
        dR.map { case (k, v) => s"R_$k" -> v } ++
        dP.flatMap { case (k, v) => Seq(s"C_$k" -> v, s"P_$k" -> v) }
    val prog = fields("prog")
    val pid = fields("pid")
    val fixed: Map[String, Column] = dates ++ Map(
      "MESSAGE" -> col("text"), "MSG" -> col("text"), "MSGONLY" -> col("text"),
      "RAWMSG" -> col("text"),
      "HOST" -> fields("host"), "HOST_FROM" -> fields("host"),
      "FULLHOST" -> fields("host"), "FULLHOST_FROM" -> fields("host"),
      "LOGHOST" -> lit(loghost),
      "HOSTID" -> substring(md5(lit(loghost)), 1, 8),
      "PROGRAM" -> prog, "PID" -> pid,
      // MSGHDR: "prog[pid]: " (macros.c:559-585)
      "MSGHDR" -> when(prog.isNull, lit(""))
        .when(pid.isNull, concat(prog, lit(": ")))
        .otherwise(concat(prog, lit("["), pid, lit("]: "))),
      "PRI" -> pri.cast("string"),
      "TAG" -> lpad(lower(hex(pri)), 2, "0"), // pri as 2-digit hex
      "BSDTAG" -> concat(pmod(pri, lit(8)).cast("string"),
        coalesce(try_element_at(facLetters, floor(pri / 8).cast("int") + 1), lit("?"))),
      "FACILITY" -> graft.model.SyslogNames.facilityName(pri),
      "FACILITY_NUM" -> graft.model.SyslogNames.facilityNum(pri).cast("string"),
      "SEVERITY" -> graft.model.SyslogNames.severityName(pri),
      "PRIORITY" -> graft.model.SyslogNames.severityName(pri),
      "LEVEL" -> graft.model.SyslogNames.severityName(pri),
      "SEVERITY_NUM" -> graft.model.SyslogNames.severityNum(pri).cast("string"),
      "LEVEL_NUM" -> graft.model.SyslogNames.severityNum(pri).cast("string"),
      "TAGS" -> concat_ws(",", col("tags")),
      // $* — the store-matches list rendered as a LIST value
      // (macros.c M__ASTERISK; matches live in the `matches` column);
      // LIST-encoded so comma-bearing captures stay one element
      "*" -> (if (columns.contains("matches")) ListValues.list_encode(col("matches"))
        else lit("")),
      // socket-address family: a table source has no peer socket; the
      // reference renders loopback/zero for local sources (macros.c:591-658)
      "SOURCEIP" -> lit("127.0.0.1"),
      "DESTIP" -> lit("127.0.0.1"),
      "DESTPORT" -> lit("0"),
      "IP_PROTO" -> lit("0"),
      "PROTO" -> lit("0"),
      "RAWMSG_SIZE" -> length(col("text")).cast("string"),
      "SEQNUM" -> seqNum.map(_.cast("string")).getOrElse(lit("")),
      // per-run / per-message ids (macros.c RUNID/RCPTID/UNIQID): the
      // reference's values are process-lifetime counters; the deterministic
      // stand-ins derive from stable inputs (repo determinism rule), so
      // re-running the batch re-produces identical output.
      "RUNID" -> substring(md5(lit(loghost + ":run")), 1, 8),
      "RCPTID" -> (if (columns.contains("conv_id") && columns.contains("turn_idx"))
        substring(md5(concat_ws(":", col("conv_id"), col("turn_idx"))), 1, 16)
      else lit("")),
      "UNIQID" -> (if (columns.contains("conv_id") && columns.contains("turn_idx"))
        concat(substring(md5(lit(loghost)), 1, 8), lit("@"),
          substring(md5(concat_ws(":", col("conv_id"), col("turn_idx"))), 1, 16))
      else lit("")),
      // $SDATA — the rfc5424 structured-data rendered back to
      // [id key="val" ...] blocks (macros.c log_macro_expand SDATA via
      // value-pairs walk); present only on rfc5424-parsed frames
      "SDATA" -> (if (columns.contains("sdata") && columns.contains("sdata_ids"))
        when(col("sdata_ids").isNull, lit(""))
          .otherwise(concat_ws("", transform(col("sdata_ids"), id =>
            concat(lit("["), id,
              concat_ws("", transform(
                filter(map_entries(col("sdata")),
                  e => e.getField("key").startsWith(concat(id, lit(".")))),
                e => concat(lit(" "),
                  e.getField("key").substr(length(id) + 2, length(e.getField("key"))),
                  lit("=\""),
                  // RFC5424 6.3.3 PARAM-VALUE escaping: \ " ]
                  regexp_replace(e.getField("value"), "([\\\\\"\\]])", "\\\\$1"),
                  lit("\"")))),
              lit("]")))))
      else lit("")),
      "SYSUPTIME" -> lit("0"))
    (name: String) =>
      fixed.get(name)
        .orElse(if (columns.contains(name)) Some(col(name)) else None)
        .orElse(Some(fields(name)))
  }
}

/** The template-function registry — the reference's UDF surface
  * (TEMPLATE_FUNCTION plugins, inventory in reference
  * modules/basicfuncs/basic-funcs.c:76-150). Every function is a thin
  * wrapper over codegen'd builtins; nothing here is a Scala UDF.
  */
object TemplateFunctions {
  import Templates.Arg

  type TFunc = Seq[Arg] => Column

  /** Numbers follow the reference's GenericNumber (lib/parse-number.c +
    * numeric-funcs.c format_number): a whole-string base-10 integer parse
    * makes an int64 operand; otherwise a strtod parse makes a double;
    * otherwise the operand is invalid and the function renders "NaN".
    * int64 results print as plain decimal; double results print "%.20f"
    * (gn_set_double defaults the print precision to 20).
    */
  private def num(c: Column): Column = c.cast("double")
  private def longOperand(c: Column): Column = {
    val s = trim(c.cast("string"))
    // the rlike gate keeps ANSI casts from throwing; int64-overflow strings
    // pass the gate but try_cast nulls them, falling back to the double path
    when(s.rlike("^[+-]?[0-9]+$"), s.try_cast("long"))
  }
  private def dblOperand(c: Column): Column =
    trim(c.cast("string")).try_cast("double")
  private val nanS = "NaN"
  private def fmt20(d: Column): Column = GraftFunctions.format_fixed(d, 20)
  /** Exact int64 division with C truncation toward zero. */
  private def ldiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      Bridge.expression(a), Bridge.expression(b)))
  }

  /** Binary numeric op (numeric-funcs.c tf_num_plus/minus/multi/div/mod):
    * int64 op when BOTH operands are integer-formed, double op otherwise;
    * "NaN" for a non-2 argc, a parse failure, a zero right operand of / and
    * %, or int64 overflow (where C wraps, we refuse — ANSI casts may not
    * throw in a data pipeline).
    */
  private def numBin(args: Seq[Arg],
      fL: (Column, Column) => Column, fD: (Column, Column) => Column,
      zeroNaN: Boolean = false): Column = {
    if (args.length != 2) return lit(nanS)
    val (al, bl) = (longOperand(args(0).col), longOperand(args(1).col))
    val (ad, bd) = (dblOperand(args(0).col), dblOperand(args(1).col))
    val invalid = ad.isNull || bd.isNull ||
      (if (zeroNaN) bd === lit(0.0) else lit(false))
    when(invalid, lit(nanS))
      .when(al.isNotNull && bl.isNotNull,
        coalesce(fL(al, bl).cast("string"), lit(nanS)))
      .otherwise(fmt20(fD(ad, bd)))
  }

  /** $(sum)/$(min)/$(max)/$(average): int64-only values, invalid ones are
    * skipped, all-invalid renders the empty string (numeric-funcs.c
    * _tf_num_aggregation + parse_int64). The reference folds one template
    * over the correlation context; here the fold is over the argument list
    * (context folds live in Correlation's aggregate builders).
    */
  private def numAgg(args: Seq[Arg], f: Column => Column): Column = {
    val valid = filter(array(args.map(x => longOperand(x.col)): _*), _.isNotNull)
    when(size(valid) === 0, lit(""))
      .otherwise(coalesce(f(valid).cast("string"), lit(nanS)))
  }
  private def sumL(v: Column): Column =
    aggregate(v, lit(0L), (acc, x) => try_add(acc, x))
  /** ceil/floor: int64 result, "NaN" on parse failure or a double too large
    * for int64 (tf_num_ceil/tf_num_floor cast through gint64).
    */
  private def numUnaryInt(args: Seq[Arg], f: Column => Column): Column = {
    if (args.length != 1) return lit(nanS)
    val x = dblOperand(args.head.col)
    when(x.isNull || abs(x) > lit(9.0e18), lit(nanS))
      .otherwise(f(x).cast("long").cast("string"))
  }

  /** k=v argument pair of $(format-json)/$(format-welf): the key is the
    * static text before '=', the value the template after it.
    */
  private def kvArgs(args: Seq[Arg]): Seq[(String, Column)] = args.map { a =>
    a.elems match {
      case Templates.Lit(s) +: rest if s.contains('=') =>
        val k = s.takeWhile(_ != '=')
        val vLit = s.drop(k.length + 1)
        val vElems = (if (vLit.nonEmpty) Seq(Templates.Lit(vLit)) else Nil) ++ rest
        k -> Templates.compileElems(vElems, a.resolver)
      case _ => sys.error("format-json/welf args must be key=value")
    }
  }

  // LIST values parse/render with the faithful codec (ListValues: quoted
  // elements, escapes, unquoted empties drop, re-quoting on encode)
  private def asList(a: Arg): Column = ListValues.list_scan(a.col)
  private def asLists(args: Seq[Arg]): Column =
    if (args.isEmpty) array().cast("array<string>")
    else if (args.length == 1) asList(args.head)
    else concat(args.map(asList): _*)
  private def render(l: Column): Column = ListValues.list_encode(l)

  /** Built-in protocol/service tables for $(getent) — both directions
    * (name→number and number→name), like nss does for the reference.
    */
  private val getentDb: Map[String, Map[String, String]] = Map(
    "protocols" -> Map(
      "icmp" -> "1", "tcp" -> "6", "udp" -> "17", "ipv6-icmp" -> "58",
      "1" -> "icmp", "6" -> "tcp", "17" -> "udp", "58" -> "ipv6-icmp"),
    "services" -> Map(
      "ssh" -> "22", "domain" -> "53", "http" -> "80", "https" -> "443",
      "syslog" -> "514", "syslog-tls" -> "6514",
      "22" -> "ssh", "53" -> "domain", "80" -> "http", "443" -> "https",
      "514" -> "syslog", "6514" -> "syslog-tls"))

  private def globRegex(g: String): String = "^" + g.flatMap {
    case '*' => ".*"
    case '?' => "."
    case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
    case c => c.toString
  } + "$"

  /** WELF value: double-quote iff it contains a space, escaping inner
    * quotes (format-welf.c:67-74).
    */
  private def welfValue(v: Column): Column =
    when(v.contains(" "),
      concat(lit("\""), regexp_replace(v, "\"", "\\\\\""), lit("\"")))
      .otherwise(v)

  /** CEF extension-value escaping (format-cef-extension.c:68-103):
    * backslash first, then `=`, LF, CR.
    */
  private def cefEscape(v: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(v,
      "\\\\", "\\\\\\\\"), "=", "\\\\="), "\n", "\\\\n"), "\r", "\\\\r")

  /** Condition argument: the reference parses it with the filter-expression
    * grammar (cond-funcs.c tf_cond); non-condition-shaped args keep the
    * curated value-truthiness fallback (`$(if $tool a b)`).
    */
  private def cond(a: Arg): Column =
    Conditions.tryCompile(a.raw, a.resolver, a.user).getOrElse(truthy(a.col))

  /** Condition over a list element: `$_` resolves to the element. */
  private def condLambda(body: Arg, elem: Column): Column = {
    val r: Templates.Resolver =
      n => if (n == "_") Some(elem) else body.resolver(n)
    Conditions.tryCompile(body.raw, r, body.user)
      .getOrElse(truthy(lambda(body, elem)))
  }

  private val registryBase: Map[String, TFunc] = Map(
    // --- cond (basic-funcs.c) -------------------------------------------
    "if" -> (a => when(cond(a(0)), a(1).col).otherwise(a(2).col)),
    "or" -> (a =>
      if (a.isEmpty) lit("")
      else coalesce(a.map(x => nullif(x.col, lit(""))) :+ lit(""): _*)),
    // --- strings --------------------------------------------------------
    "echo" -> (a => concat_ws(" ", a.map(_.col): _*)),
    // multi-arg: per-arg lengths joined with spaces (str-funcs.c tf_length)
    "length" -> (a =>
      if (a.isEmpty) lit("")
      else concat_ws(" ", a.map(x => length(x.col).cast("string")): _*)),
    // multi-arg: args join with spaces before casing (tf_lowercase/upper)
    "lowercase" -> (a => lower(concat_ws(" ", a.map(_.col): _*))),
    "uppercase" -> (a => upper(concat_ws(" ", a.map(_.col): _*))),
    // multi-arg: stripped values joined with spaces, EMPTY results skipped
    // (tf_strip appends only non-empty stripped args)
    "strip" -> (a => concat_ws(" ",
      filter(array(a.map(x => trim(x.col)): _*), _ =!= ""))),
    // substr(str, offset, [len]) — 0-based offset (reference str-funcs)
    "substr" -> (a =>
      if (a.length > 2) substring(a(0).col, a(1).int + 1, a(2).int)
      else a(0).col.substr(lit(a(1).int + 1), length(a(0).col))),
    // tf_sanitize (str-funcs.c:218-291): default invalid set is '/', control
    // chars (<32) replaced unless -C; args join with '/'
    "sanitize" -> (a => {
      var i = 0
      var repl = "_"
      var invalid = "/"
      var ctrl = true
      var more = true
      while (more && i < a.length) {
        a(i).literal match {
          case Some("-r") | Some("--replacement") =>
            repl = a(i + 1).literal.getOrElse("_"); i += 2
          case Some("-i") | Some("--invalid-chars") =>
            invalid = a(i + 1).literal.getOrElse("/"); i += 2
          case Some("-C") | Some("--no-ctrl-chars") => ctrl = false; i += 1
          case Some("-c") | Some("--ctrl-chars") => ctrl = true; i += 1
          case _ => more = false
        }
      }
      val cls = "[" + java.util.regex.Pattern.quote(invalid) +
        (if (ctrl) "\\x00-\\x1f" else "") + "]"
      val rq = java.util.regex.Matcher.quoteReplacement(repl)
      concat_ws("/", a.drop(i).map(x => regexp_replace(x.col, cls, rq)): _*)
    }),
    // replace-delimiter("from_chars", "to_char", text) — any of from_chars
    // becomes to_char (reference str-funcs.c tf_replace_delimiter)
    "replace-delimiter" -> (a => {
      val from = a(0).literal.getOrElse(sys.error("static from-chars required"))
      val to = a(1).literal.getOrElse(sys.error("static to-char required"))
      translate(a(2).col, from, to.head.toString * from.length)
    }),
    // tf_padding: a value already >= the width stays UNTRUNCATED; an empty
    // padding string pads with spaces (str-funcs.c tf_padding)
    "padding" -> (a => {
      val n = a(1).int
      val pad = a.lift(2).flatMap(_.literal).filter(_.nonEmpty).getOrElse(" ")
      when(length(a(0).col) >= n, a(0).col).otherwise(lpad(a(0).col, n, pad))
    }),
    "indent-multi-line" -> (a => regexp_replace(a(0).col, "\n", "\n\t")),
    "dirname" -> (a => when(a(0).col.contains("/"),
      regexp_extract(a(0).col, "^(.*)/[^/]*$", 1)).otherwise(lit("."))),
    "basename" -> (a => regexp_extract(a(0).col, "([^/]*)$", 1)),
    "url-encode" -> (a => url_encode(a(0).col)),
    "url-decode" -> (a => url_decode(a(0).col)),
    // multi-arg: inputs CONCATENATE before encoding (tf_base64encode)
    "base64-encode" -> (a =>
      if (a.isEmpty) lit("")
      else base64(to_binary(concat(a.map(_.col): _*), lit("utf-8")))),
    // --- numeric (numeric-funcs.c) — int64-first, reference-exact --------
    "+" -> (numBin(_, (l, r) => try_add(l, r), _ + _)),
    "-" -> (numBin(_, (l, r) => try_subtract(l, r), _ - _)),
    "*" -> (numBin(_, (l, r) => try_multiply(l, r), _ * _)),
    // integer-formed operands divide as int64 (C truncation toward zero,
    // NOT floor — -7/2 = -3); anything '.'/'e'-formed divides as double;
    // zero denominator renders "NaN" (tf_num_div gn_is_zero guard)
    "/" -> (numBin(_,
      (l, r) => when(l === Long.MinValue && r === -1L, lit(null).cast("long"))
        .otherwise(ldiv(l, r)),
      _ / _, zeroNaN = true)),
    // C %: remainder keeps the DIVIDEND's sign (-7 % 2 = -1, not pmod's 1);
    // double operands use fmod, same sign rule
    "%" -> (numBin(_, _ % _, _ % _, zeroNaN = true)),
    "sum" -> (numAgg(_, sumL)),
    "min" -> (numAgg(_, array_min)),
    "max" -> (numAgg(_, array_max)),
    "average" -> (numAgg(_, v => ldiv(sumL(v), size(v).cast("long")))),
    // $(round x [prec]): prec 0..20 else NaN; halves round away from zero
    // on the 10^prec-scaled value like C round() (tf_num_round)
    "round" -> (a => {
      val pOpt =
        if (a.isEmpty || a.length > 2) None
        else if (a.length == 1) Some(0)
        else a(1).literal.flatMap(_.trim.toIntOption).filter(p => p >= 0 && p <= 20)
      pOpt match {
        case None => lit(nanS)
        case Some(p) =>
          val x = dblOperand(a(0).col)
          val mult = math.pow(10, p)
          when(x.isNull, lit(nanS))
            .otherwise(GraftFunctions.format_fixed(round(x * mult) / mult, p))
      }
    }),
    "ceil" -> (numUnaryInt(_, ceil(_))),
    "floor" -> (numUnaryInt(_, floor(_))),
    // implode/explode (str-funcs): join a LIST with a delimiter / split a
    // string into a LIST
    "implode" -> (a => concat_ws(a(0).literal.getOrElse(" "), asLists(a.drop(1)))),
    "explode" -> (a => render(flatten(array(a.drop(1).map(x => split(x.col,
      java.util.regex.Pattern.quote(a(0).literal.getOrElse(" ")))): _*)))),
    // --- lists (list-funcs.c over lib/scanner/list-scanner) --------------
    // every list argument parses with the LIST codec (quoted elements,
    // escapes, unquoted empties drop) and multiple list args concatenate
    "list-concat" -> (a =>
      if (a.isEmpty) lit("") else render(asLists(a))),
    // $(…)@N context-index suffix (lib/template parser @-index)
    "__at" -> (a => try_element_at(asList(a(0)), lit(a(1).int + 1))),
    "list-head" -> (a =>
      if (a.isEmpty) lit("") else try_element_at(asLists(a), lit(1))),
    // reference arg order: $(list-nth INDEX list…); negatives count from
    // the end, out-of-range renders empty
    "list-nth" -> (a => {
      val n = a(0).int
      try_element_at(asLists(a.drop(1)), lit(if (n >= 0) n + 1 else n))
    }),
    "list-tail" -> (a =>
      if (a.isEmpty) lit("") else render(slice(asLists(a), 2, 1000000))),
    "list-count" -> (a => size(asLists(a)).cast("string")),
    "list-append" -> (a =>
      if (a.isEmpty) lit("")
      else render(concat(asList(a(0)), array(a.drop(1).map(_.col): _*)))),
    // $(list-slice FROM:TO list…) — python-style half-open slice, negative
    // ends relative to the length, either side optional (list-funcs.c)
    "list-slice" -> (a => {
      val spec = a(0).literal.getOrElse(sys.error("list-slice needs FROM:TO"))
      val Array(fS, tS) = (spec + " ").split(":", 2).map(_.trim)
      val l = asLists(a.drop(1))
      val len = size(l)
      def bound(s: String, dflt: Column): Column =
        if (s.isEmpty) dflt
        else {
          val k = s.toInt
          if (k >= 0) lit(k) else greatest(len + k, lit(0))
        }
      val from = least(bound(fS, lit(0)), len)
      val to = least(bound(tS, len.cast("int")), len)
      render(slice(l, from + 1, greatest(to - from, lit(0))))
    }),
    // $(list-search [--mode M] [--start-index N] NEEDLE list…) — first
    // index ≥ N whose element matches; literal/prefix/substring/glob/pcre
    "list-search" -> (a => {
      var i = 0
      var mode = "literal"
      var start = 0
      var needle: Option[Arg] = None
      val lists = Seq.newBuilder[Arg]
      while (i < a.length) {
        a(i).literal match {
          case Some("--mode") => mode = a(i + 1).literal.getOrElse("literal"); i += 2
          case Some("--start-index") => start = a(i + 1).int; i += 2
          case _ =>
            if (needle.isEmpty) needle = Some(a(i)) else lists += a(i)
            i += 1
        }
      }
      val nd = needle.getOrElse(sys.error("list-search needs a needle")).col
      val l = asLists(lists.result())
      def pred(v: Column): Column = mode match {
        case "literal"   => v === nd
        case "prefix"    => v.startsWith(nd)
        case "substring" => v.contains(nd)
        case "glob" =>
          val g = needle.get.literal.getOrElse(sys.error("glob needle must be static"))
          graft.filters.Filters.matchGlob(v, g)
        case "pcre" =>
          val re = needle.get.literal.getOrElse(sys.error("pcre needle must be static"))
          v.rlike(re) // log_matcher pcre backend: unanchored find
        case other => sys.error(s"unknown list-search mode: $other")
      }
      val idxed = transform(l, (v, ix) => struct(ix.as("i"), v.as("v")))
      val hits = filter(idxed, e => e("i") >= start && pred(e("v")))
      when(size(hits) > 0, element_at(hits, 1)("i").cast("string")).otherwise(lit(""))
    }),
    // --- ip ---------------------------------------------------------------
    "ipv4-to-int" -> (a => graft.filters.Filters.ipv4ToLong(a(0).col).cast("string")),
    // $(dns-resolve-ip [--use-fqdn] [--use-dns] [--dns-cache]
    //   [--dns-cache-hosts <file>] $ip) — reference modules/basicfuncs/
    // ip-funcs.c:85-168. The deterministic batch form: the hosts file
    // (the global dns-cache-hosts() option, bound locally here) loads at
    // plan-compile time into a literal map — one codegen try_element_at
    // per row, no per-row resolver call; unresolvable → the address text
    // (the reference's resolve_sockaddr fallback). --use-dns/--dns-cache
    // are accepted no-ops (live resolution is nondeterministic).
    "dns-resolve-ip" -> (a => {
      var useFqdn = false
      var hostsPath: Option[String] = None
      var i = 0
      var scanning = true
      while (scanning && i < a.length - 1) {
        a(i).literal match {
          case Some("--use-fqdn")               => useFqdn = true; i += 1
          case Some("--use-dns" | "--dns-cache") => i += 1
          case Some("--dns-cache-hosts") =>
            hostsPath = Some(a(i + 1).literal.getOrElse(
              sys.error("$(dns-resolve-ip): --dns-cache-hosts needs a literal path")))
            i += 2
          case _ => scanning = false
        }
      }
      val ip = a.last.col.cast("string")
      hostsPath match {
        case None => ip
        case Some(p) =>
          val entries = graft.enrich.DnsCache.parseHostsLocal(p)
          if (entries.isEmpty) ip
          else {
            val kvs = entries.flatMap { case (addr, host) =>
              Seq(lit(addr), lit(if (useFqdn) host else host.takeWhile(_ != '.')))
            }
            coalesce(try_element_at(map(kvs: _*), ip), ip)
          }
      }
    }),
    // $(geoip2 [--database <csv>] [--field path.child] $ip) — reference
    // modules/geoip2/tfgeoip.c:172 (TEMPLATE_FUNCTION geoip2): options
    // anywhere before the ip, --field defaults to country.iso_code
    // (tfgeoip.c:93), omitted --database falls back to the default
    // database (tfgeoip.c:81 — here the deterministic GeoLite-shaped
    // fixture). The database inlines as a literal bucket map; the parser
    // form (GeoIp.enrich) is the scale path.
    "geoip2" -> (a => {
      var dbPath: Option[String] = None
      var field = "country.iso_code"
      var i = 0
      var scanning = true
      while (scanning && i < a.length - 1) {
        a(i).literal match {
          case Some("--database" | "-d") =>
            dbPath = Some(a(i + 1).literal.getOrElse(
              sys.error("$(geoip2): --database needs a literal path")))
            i += 2
          case Some("--field" | "-f") =>
            field = a(i + 1).literal.getOrElse(
              sys.error("$(geoip2): --field needs a literal path"))
            i += 2
          case _ => scanning = false
        }
      }
      val ranges = dbPath.map(graft.enrich.GeoIp.loadRangesLocal)
        .getOrElse(graft.enrich.GeoIp.defaultRangesLocal)
      graft.enrich.GeoIp.lookupColumn(a.last.col.cast("string"), ranges, field)
    }),
    // --- crypto (modules/cryptofuncs) -------------------------------------
    "sha256" -> (a => truncHash(sha2(a(0).col, 256), a)),
    "sha1" -> (a => truncHash(sha1(a(0).col), a)),
    "md5" -> (a => truncHash(md5(a(0).col), a)),
    "sha512" -> (a => truncHash(sha2(a(0).col, 512), a)),
    "hash" -> (a => truncHash(sha2(a(0).col, 256), a)),
    // $(binary n n ...) — static dec/0x-hex/0-octal octets rendered as a
    // string (str-funcs.c tf_binary; bytes ≥ 0x80 via ISO-8859-1 chars)
    "binary" -> (a => lit(new String(a.map { x =>
      val n = java.lang.Long.decode(x.literal.getOrElse(
        sys.error("$(binary) requires static numeric args")).trim)
      require(n >= 0 && n <= 255, s"$$(binary): octet out of range: $n")
      n.toByte
    }.toArray, java.nio.charset.StandardCharsets.ISO_8859_1))),
    // --- format (modules/json/format-json.c, kvformat/format-welf.c) ------
    "format-json" -> (a => to_json(struct(kvArgs(a).map {
      case (k, v) => v.as(k) }: _*))),
    "format-flat-json" -> (a => to_json(struct(kvArgs(a).map {
      case (k, v) => v.as(k.replace(".", "_")) }: _*))),
    // two forms like the reference: explicit key=value args, or a
    // value-pairs walk `$(format-welf --key <glob>)` over the dynamic
    // fields map — sorted keys with "id" forced first
    // (format-welf.c:80 tf_format_welf_strcmp), values containing a space
    // are double-quoted with inner quotes escaped (:67-74)
    "format-welf" -> (a =>
      if (a.head.literal.contains("--key")) {
        val glob = a(1).literal.getOrElse(sys.error("static --key glob required"))
        val m = a.head.resolver("fields").getOrElse(
          sys.error("format-welf --key needs a fields map in scope"))
        val sorted = array_sort(transform(
          filter(map_entries(m), e => e("key").rlike(globRegex(glob))),
          e => struct(when(e("key") === "id", lit("")).otherwise(e("key")).as("s"),
            e("key").as("k"), e("value").as("v"))))
        concat_ws(" ", transform(sorted,
          s => concat(s("k"), lit("="), welfValue(s("v")))))
      } else concat_ws(" ", kvArgs(a).sortBy(_._1).map {
        case (k, v) => concat(lit(k + "="), welfValue(v))
      }: _*)),
    // $(format-cef-extension --subkeys <prefix>) — reference modules/cef/
    // format-cef-extension.c: pairs under the prefix, prefix stripped,
    // sorted (tf_cef_walk_cmp), alnum-only keys (tf_cef_is_valid_key:58;
    // bad keys are skipped per on-error ignore), values escape \ = \n \r
    // (tf_cef_append_escaped:68-103; the \uXXXX control-char and \xNN
    // invalid-UTF8 escapes are omitted — parquet strings carry neither)
    "format-cef-extension" -> (a => {
      require(a.head.literal.contains("--subkeys"),
        "format-cef-extension expects --subkeys <prefix>")
      val prefix = a(1).literal.getOrElse(sys.error("static subkeys prefix required"))
      val m = a.head.resolver("fields").getOrElse(
        sys.error("format-cef-extension needs a fields map in scope"))
      val stripped = transform(
        filter(map_entries(m), e => e("key").startsWith(prefix)),
        e => struct(
          e("key").substr(lit(prefix.length + 1), length(e("key"))).as("k"),
          e("value").as("v")))
      val sorted = array_sort(filter(stripped, s => s("k").rlike("^[a-zA-Z0-9]+$")))
      concat_ws(" ", transform(sorted,
        s => concat(s("k"), lit("="), cefEscape(s("v")))))
    }),
    // --- value-pairs walks (modules/basicfuncs/vp-funcs.c): glob-selected
    // names/values of the dynamic fields map as LIST values, key-sorted ---
    "values" -> (a => {
      val g = a(0).literal.getOrElse(sys.error("$(values) needs a static glob"))
      val m = a.head.resolver("fields").getOrElse(sys.error("$(values) needs a fields map"))
      render(transform(array_sort(transform(
        filter(map_entries(m), e => e("key").rlike(globRegex(g))),
        e => struct(e("key").as("k"), e("value").as("v")))), s => s("v")))
    }),
    "names" -> (a => {
      val g = a(0).literal.getOrElse(sys.error("$(names) needs a static glob"))
      val m = a.head.resolver("fields").getOrElse(sys.error("$(names) needs a fields map"))
      render(array_sort(filter(map_keys(m), k => k.rlike(globRegex(g)))))
    }),
    // --- env (basicfuncs misc): plan-time environment snapshot — constant
    // per compiled plan, so retries see one value (determinism rule) ------
    "env" -> (a => lit(a(0).literal.flatMap(sys.env.get).getOrElse(""))),
    // --- stardate (modules/stardate/stardate.c:109-140): year + elapsed
    // fraction of the (leap-aware) year, truncated then fixed-printed ------
    "stardate" -> (a => {
      val (digits, arg) =
        if (a.head.literal.contains("--digits")) (a(1).int, a(2)) else (2, a(0))
      require(digits >= 0 && digits <= 9, "stardate: digits must be between 0-9")
      val secs = num(arg.col).cast("long")
      val t = timestamp_seconds(secs)
      val y = year(t)
      val startSecs = unix_timestamp(make_date(y, lit(1), lit(1)).cast("timestamp"))
      val leap = (y % 4 === 0 && y % 100 =!= 0) || (y % 400 === 0)
      val ySecs = when(leap, 31622400L).otherwise(31536000L)
      val p = math.pow(10, digits)
      val frac = floor((secs - startSecs).cast("double") / ySecs * p) / p
      format_string(s"%.${digits}f", y.cast("double") + frac)
    }),
    // --- graphite plaintext lines (modules/graphite/graphite-output.c):
    // `name value unixtime\n` per pair; leading '.' in names becomes '_'
    // (:93-95); pairs from k=v args or a --key glob walk; --timestamp
    // overrides the default $R_UNIXTIME ---------------------------------
    "graphite-output" -> (a => {
      var j = 0
      var tsOpt: Option[Column] = None
      var glob: Option[String] = None
      val kvs = Seq.newBuilder[Arg]
      while (j < a.length) {
        a(j).literal match {
          case Some("--timestamp") => tsOpt = Some(a(j + 1).col); j += 2
          case Some("--key") =>
            glob = Some(a(j + 1).literal.getOrElse(sys.error("static --key glob required")))
            j += 2
          case _ => kvs += a(j); j += 1
        }
      }
      val tsC = tsOpt.getOrElse(
        a.head.resolver("R_UNIXTIME").orElse(a.head.resolver("UNIXTIME"))
          .map(_.cast("string"))
          .getOrElse(sys.error("graphite-output: no UNIXTIME in scope and no --timestamp")))
      def line(k: Column, v: Column): Column =
        concat(regexp_replace(k, "^\\.", "_"), lit(" "), v, lit(" "), tsC, lit("\n"))
      glob match {
        case Some(g) =>
          val m = a.head.resolver("fields").getOrElse(
            sys.error("graphite-output --key needs a fields map in scope"))
          val sorted = array_sort(transform(
            filter(map_entries(m), e => e("key").rlike(globRegex(g))),
            e => struct(e("key").as("k"), e("value").as("v"))))
          concat_ws("", transform(sorted, s => line(s("k"), s("v"))))
        case None =>
          concat(kvArgs(kvs.result()).map { case (k, v) => line(lit(k), v) }: _*)
      }
    }),
    // --- getent (modules/getent/tfgetent.c): protocols/services lookups
    // from a built-in table (IANA basics); passwd/group/uid lookups are
    // environment-dependent and out of scope ----------------------------
    "getent" -> (a => {
      val db = a(0).literal.getOrElse(sys.error("getent: static database name required"))
      val table = getentDb.getOrElse(db,
        sys.error(s"getent: unsupported database $db (protocols/services only)"))
      coalesce(element_at(typedlit(table), a(1).col), lit(""))
    }),
    // --- iteration (tf-map.c, tf-filter.c): first arg is a template over
    //     `$_` (the current element), second the comma-separated list ------
    "map" -> (a => render(transform(asList(a(1)), x => lambda(a(0), x)))),
    "filter" -> (a => render(filter(asList(a(1)), x => condLambda(a(0), x)))),
    // $(iterate f initial) — reference modules/basicfuncs/tf-iterate.c:
    // emit the accumulator, THEN update it with f($_ = accumulator), once
    // per message. The n-th message (0-based) therefore renders
    // f^n(initial). Batch form: the caller binds the row's 0-based
    // position in deterministic order as `__iter_idx` through the
    // resolver (a window rank / turn index), and the value is computed
    // with the codegen aggregate() HOF folding f over an idx-length
    // array. f must depend on $_ only (the reference's documented use —
    // counters/accumulator chains); a fold that reads OTHER rows' fields
    // is a grouping-by context aggregate, not $(iterate).
    "iterate" -> (a => {
      val idx = a(0).resolver("__iter_idx").getOrElse(sys.error(
        "$(iterate) needs an iteration scope: bind __iter_idx (the row's " +
          "0-based position in deterministic order) through the resolver"))
        .cast("int")
      aggregate(array_repeat(lit(1), idx), a(1).col,
        (acc, _) => lambda(a(0), acc))
    }),
    // --- format-date (modules/timestamp/tf-format-date.c): strftime ------
    "format-date" -> (a => {
      val fmt = strftimeToJava(a(0).literal.getOrElse(sys.error("static strftime format required")))
      date_format(a(1).col.cast("timestamp"), fmt)
    }),
    // --- tags --------------------------------------------------------------
    "tag" -> (a => when(array_contains(col("tags"), a(0).col), "1").otherwise("0")),
    "tags-head" -> (a => element_at(col("tags"), 1)),
    // --- context functions (reference basic-funcs.c:81-83, evaluated over
    //     a whole CorrelationContext): these compile to AGGREGATE columns,
    //     so a template using them is only valid inside grouping-by's
    //     aggregate() (exactly the reference's constraint — num_msg > 1
    //     contexts). $(context-values $x $order) needs the explicit order
    //     ref because a batch context has no arrival order of its own.
    "context-length" -> (_ => graft.operators.Correlation.Context.length.cast("string")),
    // values LIST-encode (a value containing a comma renders quoted —
    // test_context_funcs ${comma_value} cases)
    "context-values" -> (a => render(
      graft.operators.Correlation.Context.values(a(0).col, ctxOrder(a, 1)))),
    // $(context-lookup cond $x $order) / $(grep cond $x $order): the order
    // ref keeps multi-match output deterministic across retries
    "context-lookup" -> (a => render(
      graft.operators.Correlation.Context.lookup(cond(a(0)), a(1).col, ctxOrder(a, 2)))),
    "grep" -> (a => render(
      graft.operators.Correlation.Context.grep(cond(a(0)), a(1).col, ctxOrder(a, 2))))
  )

  /** Context order for the context-function family: the explicit trailing
    * order argument when given, else the ambient `__ctx_order` the
    * grouping-by() config driver binds through the resolver (sort-key()
    * order, or arrival order). The reference needs no argument because a
    * C context array HAS an arrival order; a batch context does not.
    */
  private def ctxOrder(a: Seq[Arg], idx: Int): Column =
    if (a.length > idx) a(idx).col
    else a(0).resolver("__ctx_order").getOrElse(sys.error(
      "$(context-*) without an order argument is only valid inside " +
        "grouping-by(), which binds the context order"))

  /** The callable surface: the base table plus the underscore plugin
    * aliases (the C plugin names are underscored even though the
    * documented call form is dashed — both resolve upstream).
    */
  val registry: Map[String, TFunc] = registryBase ++ Map(
    "format_json" -> registryBase("format-json"),
    "format_flat_json" -> registryBase("format-flat-json"),
    "graphite_output" -> registryBase("graphite-output"))

  /** Compile a template argument as a lambda body: `$_` resolves to the
    * current list element, everything else to the enclosing row scope.
    */
  private def lambda(body: Arg, elem: Column): Column =
    Templates.compileElems(body.elems,
      name => if (name == "_") Some(elem) else body.resolver(name))

  /** strftime → java.time pattern for the common codes. */
  def strftimeToJava(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    var lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      if (s.exists(_.isLetter)) sb.append("'").append(s.replace("'", "''")).append("'")
      else sb.append(s)
      lit = new StringBuilder
    }
    while (i < fmt.length) {
      if (fmt(i) == '%' && i + 1 < fmt.length) {
        flushLit()
        fmt(i + 1) match {
          case 'Y' => sb.append("yyyy")
          case 'y' => sb.append("yy")
          case 'm' => sb.append("MM")
          case 'd' => sb.append("dd")
          case 'H' => sb.append("HH")
          case 'M' => sb.append("mm")
          case 'S' => sb.append("ss")
          case 'b' => sb.append("MMM")
          case 'B' => sb.append("MMMM")
          case 'a' => sb.append("EEE")
          case 'j' => sb.append("DDD")
          case 'f' => sb.append("SSS") // fractional seconds (date-parser %f)
          case 'I' => sb.append("hh")
          case 'p' => sb.append("a")
          case 'Z' => sb.append("zz")
          case 'z' => sb.append("XX") // ±hhmm / Z zone suffix
          case '%' => lit.append('%')
          case c   => sys.error(s"unsupported strftime code %$c")
        }
        i += 2
      } else { lit.append(fmt(i)); i += 1 }
    }
    flushLit()
    sb.toString
  }

  /** Truthiness of a rendered value (reference $(if) evaluates a filter; our
    * curated surface: non-empty, non-zero, non-false strings are true).
    */
  def truthy(c: Column): Column = {
    val s = lower(trim(c.cast("string")))
    s.isNotNull && s =!= "" && s =!= "0" && s =!= "false"
  }

  private def truncHash(h: Column, a: Seq[Arg]): Column =
    if (a.length > 1) substring(h, 1, a.last.int) else h
}

/** Per-MATCH template rendering for `subst()` replacement templates — the
  * reference evaluates a subst() replacement as a LogTemplate against the
  * message with `$0`..`$n` bound to the current match's capture groups when
  * `flags(store-matches)` is set (reference lib/rewrite/rewrite-subst.c +
  * scl/rewrite/cc-mask.conf, whose replacement is
  * `$(substr $0 0 6)******$(substr $0 -4 4)`).
  *
  * Column-tree templates cannot express "per occurrence of a regex inside
  * one value", so this renderer evaluates the (static) template in Scala
  * per match inside [[GraftFunctions.regexp_subst_template]]'s expression.
  * The supported surface is the subset meaningful per-match: `$0..$n` group
  * refs, literals, `${n:-default}`, and the pure string/crypto functions.
  */
object MatchTemplates {

  /** groups(i) = capture group i of the current match (0 = whole match).
    * Unsupported functions fail HERE (plan time, the template is static),
    * not per row on an executor.
    */
  def compile(tmpl: String): (Int => Option[String]) => String = {
    val elems = Templates.parse(tmpl)
    validate(elems)
    gs => render(elems, gs)
  }

  private val supported = Set("substr", "uppercase", "lowercase", "echo",
    "length", "sha1", "sha256", "sha512", "md5", "hash")

  private def validate(elems: Seq[Templates.Elem]): Unit = elems.foreach {
    case Templates.Call(fn, args, _) =>
      require(supported(fn),
        s"$$($fn) is not supported in a subst() replacement template")
      args.foreach(validate)
    case Templates.Ref(_, Some(d)) => validate(d)
    case _ =>
  }

  private def render(elems: Seq[Templates.Elem], gs: Int => Option[String]): String =
    elems.iterator.map {
      case Templates.Lit(s) => s
      case Templates.Ref(name, dflt) =>
        name.toIntOption.flatMap(gs)
          .orElse(dflt.map(render(_, gs)))
          .getOrElse("")
      case Templates.Call(fn, args, _) => call(fn, args.map(render(_, gs)))
    }.mkString

  private def call(fn: String, args: Seq[String]): String = fn match {
    case "substr" => refSubstr(args(0), args(1).trim.toLong,
      args.lift(2).map(_.trim.toLong))
    case "uppercase" => args.head.toUpperCase
    case "lowercase" => args.head.toLowerCase
    case "echo" => args.mkString(" ")
    case "length" => args.head.length.toString
    case "sha1" | "sha256" | "sha512" | "md5" | "hash" =>
      val (value, len) = hashArgs(args)
      val algo = fn match {
        case "sha1" => "SHA-1"
        case "md5" => "MD5"
        case "sha512" => "SHA-512"
        case _ => "SHA-256"
      }
      val hex = java.security.MessageDigest.getInstance(algo)
        .digest(value.getBytes("UTF-8")).map("%02x".format(_)).mkString
      len.fold(hex)(n => hex.take(n))
    case other =>
      sys.error(s"$$($other) is not supported in a subst() replacement template")
  }

  /** `$(hash --length N v)` or `$(hash v N)` (tf_hash option parsing). */
  private def hashArgs(args: Seq[String]): (String, Option[Int]) =
    if (args.headOption.contains("--length")) (args(2), Some(args(1).trim.toInt))
    else (args(0), args.lift(1).map(_.trim.toInt))

  /** $(substr str start [len]) with the reference's negative-offset/-length
    * rules (modules/basicfuncs/str-funcs.c tf_substr): negative start counts
    * from the end; negative len leaves -len chars unconsumed at the end;
    * out-of-range combinations render the empty string.
    */
  private[functions] def refSubstr(s: String, start0: Long, len0: Option[Long]): String = {
    val n = s.length.toLong
    var start = start0
    var len = len0.getOrElse(n)
    if (len < 0 && -len > n) return ""
    if (len > n) len = n
    if (start >= n) return ""
    if (start < 0 && -start > n) return ""
    if (len < 0 && ((start < 0 && start > len) || (start >= 0 && len + n - start < 0)))
      return ""
    if (start < 0) start = math.max(0, start + n)
    if (len < 0) { len = n - start + len; if (len < 0) return "" }
    if (start + len > n) len = n - start
    s.substring(start.toInt, (start + len).toInt)
  }
}
