package graft.config

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.filters.Filters
import graft.parsers.{FieldParsers, GrokStage}
import graft.rewrite.Rewrites

/** Text form of the configuration — a syslog-ng-style grammar subset
  * (reference lib/cfg-grammar.y / cfg-lex.l) compiled to [[Dsl.Config]]:
  *
  * {{{
  * source s_app { transcripts("/root/testdata/sf0.001"); };
  * filter f_err { match("error" value("status")) and not severity(debug..info); };
  * parser p_grok { db-parser(); };
  * rewrite r_tag { set-tag("checked"); };
  * destination d_err { file("errors"); };
  * log { source(s_app); parser(p_grok); filter(f_err); rewrite(r_tag);
  *       destination(d_err); flags(final); };
  * }}}
  *
  * Supported filter functions: match(re value(col)), host(re), program(re),
  * message(re), facility(n1,n2,…), severity(lo..hi), tags(t…), in-list(col,
  * v…), source(name); boolean and/or/not/parens (reference
  * lib/filter/filter-expr-grammar.ym:137-235). Field references resolve to
  * top-level columns first, then the grok `fields` map.
  */
object ConfigText {

  // ----------------------------------------------------------------- lexer
  private sealed trait Tok
  private case class Ident(s: String) extends Tok
  private case class Str(s: String) extends Tok
  private case class Punct(c: String) extends Tok

  private def lex(text: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    while (i < text.length) {
      val c = text(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < text.length && text(i) != '\n') i += 1 }
      else if (c == '"' || c == '\'') {
        val close = text.indexOf(c, i + 1)
        require(close > 0, s"unterminated string at $i")
        out += Str(text.substring(i + 1, close)); i = close + 1
      } else if (c.isLetterOrDigit || c == '_' || c == '-' || c == '$' || c == '/') {
        var j = i
        while (j < text.length &&
          (text(j).isLetterOrDigit || "_-$./*?".contains(text(j)))) j += 1
        out += Ident(text.substring(i, j)); i = j
      } else if (c == '.' && i + 1 < text.length && text(i + 1) == '.') {
        out += Punct(".."); i += 2
      } else { out += Punct(c.toString); i += 1 }
    }
    out.result()
  }

  // ---------------------------------------------------------------- parser
  private final class P(var toks: List[Tok]) {
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val t = toks.head; toks = toks.tail; t }
    def expect(p: String): Unit = next() match {
      case Punct(`p`) => ()
      case other      => sys.error(s"expected '$p', got $other")
    }
    def ident(): String = next() match {
      case Ident(s) => s
      case Str(s)   => s
      case other    => sys.error(s"expected identifier, got $other")
    }
    def isPunct(p: String): Boolean = peek.contains(Punct(p))
    def eat(p: String): Boolean = if (isPunct(p)) { next(); true } else false
    def peek2: Option[Tok] = toks.drop(1).headOption
  }

  /** One parsed driver invocation: `name(arg1 arg2, key(v)...)` — args are
    * flattened to strings; `value("x")`-style wrappers keep their shape as
    * `key=v` entries.
    */
  private final case class Call(name: String, args: Seq[String], kwargs: Map[String, String])

  /** Options whose parenthesized body is kept as raw text for the driver
    * to re-parse (filter expressions / synthetic-message sub-grammars). */
  private val rawKwargs =
    Set("condition", "where", "having", "trigger", "aggregate")

  private def parseCall(p: P): Call = {
    val name = p.ident()
    val args = Seq.newBuilder[String]
    val kwargs = Map.newBuilder[String, String]
    if (p.eat("(")) {
      while (!p.isPunct(")")) {
        if (p.eat(",")) ()
        else p.next() match {
          case Ident(s) if rawKwargs(s) && p.isPunct("(") =>
            // condition/where/having/trigger(<filter expr>) and
            // aggregate(<synthetic message>) keep their RAW text; the
            // driver re-parses it with the right grammar (reference
            // lib/rewrite/rewrite-expr.c:36-48 for filter exprs,
            // correlation-grammar.ym:173,199-210 for synthetic messages)
            p.expect("(")
            kwargs += s -> rawUntilClose(p)
          case Ident(s) if p.isPunct("(") =>
            // option(value [, value…]) — multi-value options (flags lists)
            // join with commas, e.g. flags(global, store-matches)
            p.expect("(")
            val vals = Seq.newBuilder[String]
            while (!p.isPunct(")")) {
              if (p.eat(",")) ()
              else p.next() match {
                case Ident(t) if p.isPunct("(") =>
                  // typed column wrapper: columns(... int("pid") ...)
                  // (csvparser.c typed columns) — encoded "int:pid"
                  p.expect("(")
                  val v = p.next() match {
                    case Str(x) => x; case Ident(x) => x
                    case other => sys.error(s"unexpected $other in $t(...)")
                  }
                  p.expect(")")
                  vals += s"$t:$v"
                case Ident(v) => vals += v
                case Str(v)   => vals += v
                case other    => sys.error(s"unexpected $other in $s(...)")
              }
            }
            p.expect(")")
            // patterns() are regexes — commas are pattern text, so the
            // list keeps a NUL separator instead of the ',' join
            kwargs += s -> vals.result().mkString(
              if (s == "patterns") "\u0000" else ",")
          case Ident(s) if p.isPunct("..") =>
            p.next(); val hi = p.ident(); args += s"$s..$hi"
          case Ident(s) => args += s
          case Str(s)   => args += s
          case other    => sys.error(s"unexpected $other in args")
        }
      }
      p.expect(")")
    }
    Call(name, args.result(), kwargs.result().toMap)
  }

  /** Reconstruct the raw text of a parenthesized token run (up to the
    * matching close paren): strings re-quote, '='-family punct runs glue
    * back into `==`/`!=`/`<=`/`>=`.
    */
  private def rawUntilClose(p: P): String = {
    val sb = new StringBuilder
    var depth = 0
    var glue = false
    def sp(): Unit = if (sb.nonEmpty && sb.last != '(') sb += ' '
    while (!(depth == 0 && p.isPunct(")"))) {
      p.next() match {
        case Ident(s)   => sp(); sb ++= s; glue = false
        case Str(s)     => sp(); sb += '"'; sb ++= s; sb += '"'; glue = false
        case Punct("(") => depth += 1; sp(); sb += '('; glue = false
        case Punct(")") => depth -= 1; sb += ')'; glue = false
        case Punct(c) if "=!<>".contains(c.head) =>
          if (glue) sb ++= c else { sp(); sb ++= c }
          glue = true
        case Punct(c) => sp(); sb ++= c; glue = false
      }
    }
    p.expect(")")
    sb.toString
  }

  /** condition(<filter expr>) guard of a rewrite rule — same resolution as
    * templates (columns → macro family → fields map).
    */
  private def conditionPred(df: DataFrame, text: String,
      user: Map[String, String]): Column =
    graft.functions.Conditions.tryCompile(text, frameResolver(df), user)
      .getOrElse(sys.error(s"condition() does not parse as a filter expression: $text"))

  /** Name resolution over a frame: top-level columns shadow the standard
    * macro family (which itself falls back to the parsed `fields` map) —
    * ONE order for templates, conditions and parser inputs, so $FACILITY /
    * $SDATA resolve identically everywhere.
    */
  private def frameResolver(df: DataFrame): graft.functions.Templates.Resolver = {
    val cols = df.columns.toSet
    val ts = if (cols.contains("ts")) col("ts").cast("timestamp")
      else lit(null).cast("timestamp")
    val pri = if (cols.contains("pri")) col("pri").cast("int") else lit(13)
    val fields = if (cols.contains("fields")) col("fields")
      else map().cast("map<string,string>")
    val std = graft.functions.Templates.standardResolver(cols, ts, pri, fields)
    n => (if (cols.contains(n)) Some(col(n)) else None).orElse(std(n))
  }

  // --------------------------------------------- filter expression → Column
  /** Resolve a field name: top-level column else grok fields map entry. */
  private def field(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) col(name)
    else if (df.columns.contains("fields")) col("fields")(name)
    else col(name)

  private def filterExpr(
      p: P,
      named: scala.collection.Map[String, DataFrame => Column] = Map.empty): DataFrame => Column = {
    def or(): DataFrame => Column = {
      var l = and()
      while (p.peek.contains(Ident("or"))) { p.next(); val r = and(); val ll = l; l = df => ll(df) || r(df) }
      l
    }
    def and(): DataFrame => Column = {
      var l = unary()
      while (p.peek.contains(Ident("and"))) { p.next(); val r = unary(); val ll = l; l = df => ll(df) && r(df) }
      l
    }
    def unary(): DataFrame => Column = p.peek match {
      case Some(Ident("not")) => p.next(); val e = unary(); df => !e(df)
      case Some(Punct("(")) => p.next(); val e = or(); p.expect(")"); e
      case _ => simple()
    }
    // comparison operator: eq/ne/lt/le/gt/ge idents (string compare) or the
    // punct forms == != < <= > >= === !== (the lexer emits single-char
    // puncts, so multi-char operators are greedy '=' runs)
    def cmpOp(): String = p.next() match {
      case Ident(s) if Set("eq", "ne", "lt", "le", "gt", "ge")(s) => s
      case Punct(c0) if "<>=!".contains(c0) =>
        val sb = new StringBuilder(c0)
        while (p.isPunct("=")) { p.next(); sb += '=' }
        val s = sb.toString
        require(Set("==", "===", "!=", "!==", "<", "<=", ">", ">=")(s),
          s"unknown comparison operator: $s")
        s
      case other => sys.error(s"expected comparison operator, got $other")
    }
    def cmpFollows: Boolean = p.peek2.exists {
      case Punct(c) => "<>=!".contains(c.head)
      case Ident(s) => Set("eq", "ne", "lt", "le", "gt", "ge")(s)
      case _ => false
    }
    def simple(): DataFrame => Column = p.peek match {
      case Some(Str(_)) | Some(Ident(_)) if p.peek.exists(_.isInstanceOf[Str]) || cmpFollows =>
        // [bare or quoted] template OP template — both sides are templates
        // over the message (reference lib/filter/filter-cmp.c:
        // `$SEVERITY_NUM == 7`, `"$HOST" eq "bzorp"`; eq… compare strings,
        // == … compare type-aware numeric-first)
        val l = p.next() match { case Str(s) => s; case Ident(s) => s; case other => sys.error(s"$other") }
        val op = cmpOp()
        val r = p.next() match {
          case Str(s)   => s
          case Ident(s) => s
          case other    => sys.error(s"comparison needs a right operand, got $other")
        }
        df => {
          val lc = templateValue(df, l, Map.empty)
          val rc = templateValue(df, r, Map.empty)
          op match {
            case "eq" | "ne" | "lt" | "le" | "gt" | "ge" => Filters.cmpString(lc, rc, op)
            case "==="  => Filters.cmpTypedEq(lc, rc)
            case "!=="  => !Filters.cmpTypedEq(lc, rc)
            case sym    => Filters.cmpTypeAware(lc, rc, sym)
          }
        }
      case _ => simpleCall()
    }
    def simpleCall(): DataFrame => Column = {
      val c = parseCall(p)
      // type(pcre|string|glob) + flags(prefix substring ignore-case) select
      // the matcher backend on the re-style filters (lib/filter/filter-re.c)
      def m = Filters.matcher(c.args.head,
        c.kwargs.getOrElse("type", "pcre"),
        c.kwargs.get("flags").map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty))
      c.name match {
        case "match" =>
          val target = c.kwargs.get("value")
          df => m(target.map(field(df, _)).getOrElse(col("text")))
        case "host"     => df => m(field(df, "host"))
        case "program"  => df => m(field(df, "prog"))
        case "message"  => df => m(col("text"))
        case "facility" => df => Filters.facility(field(df, "pri").cast("int"), c.args: _*)
        case "severity" | "level" =>
          val Array(lo, hi) = c.args.head.split("\\.\\.")
          df => Filters.severityRange(field(df, "pri").cast("int"), lo, hi)
        case "tags"    => df => Filters.hasAnyTag(col("tags"), c.args: _*)
        case "in-list" => df => Filters.inList(field(df, c.args.head), c.args.tail)
        case "source"  => _ => col("__source") === c.args.head
        case "filter"  => // filter(name) inside an expression (reference
          // lib/filter/filter-call.c); resolved lazily so statement order
          // matches the reference's config-time reference check
          val n = c.args.head
          df => named.getOrElse(n, sys.error(s"filter() references unknown filter: $n"))(df)
        case other     => sys.error(s"unknown filter function: $other")
      }
    }
    or()
  }

  // ------------------------------------------------------- driver registries
  private def sourceDriver(c: Call): SparkSession => DataFrame = c.name match {
    case "transcripts" =>
      s => graft.transcripts.Transcripts.load(s, c.args.head)
    // file("path" format(text)) — raw log-text lines, the reference's
    // affile source (glob paths supported like wildcard-file). Lines land
    // in `text` with their origin in `src_file`; octet-counted streams
    // use format(framed) over binaryFile blobs.
    case "parquet" | "file" | "wildcard-file" if c.kwargs.get("format").contains("text") =>
      s => s.read.textFile(c.args.head).toDF("text")
        .withColumn("src_file", input_file_name())
    case "file" | "wildcard-file" if c.kwargs.get("format").contains("framed") =>
      s => graft.sources.Framing.octetCounted(
        s.read.format("binaryFile").load(c.args.head), col("content"))
        .select(col("record").as("text"), col("record_ok"),
          col("path").as("src_file"))
    case "parquet" | "file" | "wildcard-file" =>
      s => s.read.parquet(c.args.head)
    case other => sys.error(s"unknown source driver: $other")
  }

  /** A parser driver: the frame transform plus an optional KEEP predicate
    * (drop-invalid). Dropping rows inside the transform would corrupt the
    * Compiler's shared-frame model (every path and the stash/blend guard
    * assume row alignment) — drop-invalid instead compiles to a path
    * FilterE, which routes the row out of THIS path only, exactly the
    * reference's per-path drop semantics.
    */
  /** Receive clock for config-text syslog/cisco parsers when `recv-time()`
    * is absent (a ported reference config never has it): the DRIVER wall
    * clock captured once at plan-compile time — deterministic across task
    * retries because it is a literal baked into the compiled stage — which
    * matches the reference's msg->timestamps[LM_TS_RECVD]=now used for BSD
    * year guessing. Previously this silently defaulted to epoch 0 and
    * year-less stamps landed in 1970. Pass `recv-time(<epoch-usec>)` to pin
    * the clock for reproducible runs and oracle checks. */
  private def defaultRecvTimeUsec(parser: String): Long = {
    System.err.println(s"[graft] $parser: no recv-time() — using the driver " +
      "wall clock for BSD year guessing / missing timestamps; pass " +
      "recv-time(<epoch-usec>) for reproducible output")
    System.currentTimeMillis() * 1000L
  }

  /** A template that is a single bare `$name` ref resolves to the TYPED
    * column (order/sort refs must compare as their native type — "10" < "2"
    * as strings); anything else renders as the usual string template. */
  private def typedTemplate(text: String,
      resolver: graft.functions.Templates.Resolver): Column =
    graft.functions.Templates.parse(text) match {
      case Seq(graft.functions.Templates.Ref(n, None)) =>
        resolver(n).getOrElse(sys.error(s"unknown field in template: $n"))
      case _ => graft.functions.Templates.compile(text, resolver)
    }

  /** Does a template use the context-function family (and therefore
    * compile to an aggregate Column)? */
  private def usesContextFns(elems: Seq[graft.functions.Templates.Elem]): Boolean = {
    import graft.functions.Templates.{Call => TCall, Ref => TRef}
    elems.exists {
      case TCall(fn, args, _) =>
        Set("context-length", "context-values", "context-lookup", "grep")(fn) ||
          args.exists(usesContextFns)
      case TRef(_, Some(d)) => usesContextFns(d)
      case _ => false
    }
  }

  /** grouping-by() — the reference's correlation aggregator as a config
    * driver (modules/correlation/groupingby.c, grammar
    * correlation-grammar.ym:140-185). Batch mapping:
    *
    *  - key("<tmpl>") → group key; timeout(n) → session gap in seconds over
    *    the frame's event time (the reference's timer wheel);
    *  - sort-key("<tmpl>") → context order for the aggregate templates
    *    (grouping-parser.c:37-42,146 sorts the context before aggregation;
    *    the glib sort is stable, so arrival order is the tiebreak);
    *  - order("<tmpl>") [graft batch extension, default `$ts`] → the
    *    arrival-order ref: a batch context has no implicit sequence;
    *  - aggregate(value("n" "<tmpl>")… inherit-mode(m) tags(t…)) → the
    *    synthetic message (correlation-grammar.ym:199-210): templates using
    *    $(context-*) compile to aggregate columns; plain templates render
    *    the LAST message of the sorted context (synthetic-message.c
    *    evaluates against messages[len-1]); inherit-mode none (default) /
    *    last-message / context controls which original columns carry over;
    *  - where(<expr>) pre-filters arrivals, having(<expr>) post-filters
    *    closed contexts (groupingby.c:94-99);
    *  - trigger("$(context-length)" == "N") closes every N messages
    *    (the batch-expressible trigger form);
    *  - inject-mode(pass-through|internal|aggregate-only): pass-through
    *    (the stateful-parser default) unions the originals under the
    *    synthetics.
    */
  private def compileGroupingBy(df: DataFrame, c: Call): DataFrame = {
    import graft.functions.Templates
    val resolver = frameResolver(df)
    val key = typedTemplate(
      c.kwargs.getOrElse("key", sys.error("grouping-by: missing key()")), resolver)
    val timeout = c.kwargs.getOrElse("timeout",
      sys.error("grouping-by: missing timeout()")).trim.toLong
    val sessionTs = resolver("ts").getOrElse(
      sys.error("grouping-by needs an event-time ts field")).cast("timestamp")
    val arrival = typedTemplate(c.kwargs.getOrElse("order", "${ts}"), resolver)
    val ctxOrder = c.kwargs.get("sort-key") match {
      case Some(sk) =>
        struct(Templates.compile(sk, resolver).as("__sk"), arrival.as("__ao"))
      case None => arrival
    }
    val aggResolver: Templates.Resolver =
      name => if (name == "__ctx_order") Some(ctxOrder) else resolver(name)

    // ---- aggregate(<synthetic message>) sub-grammar
    val prefix = c.kwargs.getOrElse("prefix", "")
    var inheritMode = "none"
    val values = Seq.newBuilder[(String, Column)]
    var tagLits: Seq[String] = Nil
    val p = new P(lex(c.kwargs.getOrElse("aggregate", "")))
    while (p.peek.isDefined) {
      if (p.eat(",") || p.eat(";")) ()
      else parseCall(p) match {
        case Call("value", Seq(n, tmpl), _) =>
          val elems = Templates.parse(tmpl)
          val compiled = Templates.compile(tmpl, aggResolver)
          val agg =
            if (usesContextFns(elems)) compiled
            else max_by(compiled, ctxOrder) // last message of the sorted context
          values += ((prefix + n) -> agg)
        case Call("inherit-mode", Seq(m), _) => inheritMode = m
        case Call("tags", tagArgs, _)        => tagLits = tagArgs
        case other => sys.error(s"grouping-by aggregate(): unsupported $other")
      }
    }
    val valueCols = values.result()
    require(valueCols.nonEmpty, "grouping-by: aggregate() needs at least one value()")
    val taken = valueCols.map(_._1).toSet + "key" + "session_start" + "session_end"
    val inherited: Seq[Column] = inheritMode match {
      case "none" => Nil
      case "last-message" =>
        df.columns.toSeq.filterNot(taken).map(cn => max_by(col(cn), ctxOrder).as(cn))
      case "context" =>
        df.columns.toSeq.filterNot(taken)
          .map(cn => max_by(col(cn), when(col(cn).isNotNull, ctxOrder)).as(cn))
      case other => sys.error(s"grouping-by: unknown inherit-mode($other)")
    }
    val aggs = valueCols.map { case (n, a) => a.as(n) } ++ inherited

    val dIn = c.kwargs.get("where")
      .map(w => df.filter(conditionPred(df, w, Map.empty))).getOrElse(df)

    val grouped0 = c.kwargs.get("trigger") match {
      case Some(t) =>
        val m = """(?s).*context-length\D*?(\d+).*""".r
        val n = t match {
          case m(d) => d.toInt
          case _ => sys.error("grouping-by trigger(): only the " +
            "\"$(context-length)\" == \"N\" form is expressible in batch, got: " + t)
        }
        graft.operators.Correlation.groupingByTriggered(
          dIn, Seq(key.as("key")), sessionTs, timeout, n, aggs,
          tieBreak = Seq(arrival))
      case None =>
        graft.operators.Correlation.groupingBy(
          dIn, Seq(key.as("key")), sessionTs, s"$timeout seconds", aggs)
    }
    val tagged =
      if (tagLits.isEmpty) grouped0
      else grouped0.withColumn("tags", array(tagLits.map(lit): _*))
    val had = c.kwargs.get("having")
      .map(h => tagged.filter(conditionPred(tagged, h, Map.empty))).getOrElse(tagged)
    c.kwargs.getOrElse("inject-mode", "pass-through") match {
      case "pass-through" => had.unionByName(df, allowMissingColumns = true)
      case "internal" | "aggregate-only" => had
      case other => sys.error(s"grouping-by: unknown inject-mode($other)")
    }
  }

  private def parserDriver(c: Call): (DataFrame => DataFrame, Option[DataFrame => Column]) = c.name match {
    case "grouping-by" =>
      ((df: DataFrame) => compileGroupingBy(df, c), None)
    case "db-parser" | "grok" =>
      // db-parser(file("rules.xml")) loads a patterndb XML rule set and
      // runs the typed radix matcher; without file() the grok transcript
      // ruleset applies (regexp first-match)
      c.kwargs.get("file") match {
        case Some(path) =>
          val rules = graft.parsers.PatternDb.loadXml(new String(
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
          ((df: DataFrame) => graft.parsers.PatternDb.promote(
            graft.parsers.PatternDb.annotate(
              df, c.kwargs.getOrElse("value", "text"), rules), rules), None)
        case None =>
          ((df: DataFrame) => GrokStage(df, c.kwargs.getOrElse("value", "text"),
            GrokStage.transcriptRules), None)
      }
    case "kv-parser" =>
      // quoted-dialect scan when requested or when the SCL-preset options
      // (value-separator/pair-separator — checkpoint ':'/';' and '|'/'=')
      // are present; plain str_to_map otherwise
      val sepOpts = c.kwargs.contains("value-separator") ||
        c.kwargs.contains("pair-separator")
      if (c.kwargs.get("dialect").contains("scanner") ||
          c.args.contains("extract-stray-words") || sepOpts)
        ((df: DataFrame) => {
          val (d2, in) = parserInput(df, c)
          val pfx = c.kwargs.getOrElse("prefix", "kv_")
          // re-running the scan (e.g. per if/else format branch) OVERWRITES
          // the previous fields map instead of appending a duplicate column
          val base = d2.drop(Seq(s"${pfx}fields", s"${pfx}stray")
            .filterNot(_ == in): _*)
          graft.parsers.Scanners.kvStage(base, in,
            graft.parsers.Scanners.KvOptions(
              valueSeparator =
                c.kwargs.get("value-separator").map(_.head).getOrElse('='),
              pairSeparator = c.kwargs.getOrElse("pair-separator", ", "),
              extractStrayWords = c.args.contains("extract-stray-words")),
            prefix = pfx).drop(tmpInputCol)
        }, None)
      else
        ((df: DataFrame) => df.withColumn(c.kwargs.getOrElse("prefix", "kv"),
          FieldParsers.kvParser(col(c.kwargs.getOrElse("value", "text")))), None)
    case "syslog-parser" =>
      // full RFC3164/RFC5424 classification (modules/syslogformat) —
      // flags(...) select the LP_* behaviors; recv-time()/time-zone() pin
      // the deterministic receive clock used for year guessing and
      // missing timestamps
      val flags = c.kwargs.get("flags")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty) ++ c.args
      val o = graft.parsers.SyslogFormat.Options(
        flags = flags,
        defaultPri = c.kwargs.get("default-pri").map(_.toInt).getOrElse(-1),
        recvZone = c.kwargs.get("time-zone")
          .map(java.time.ZoneId.of).getOrElse(java.time.ZoneOffset.UTC),
        nowEpochUsec = c.kwargs.get("recv-time").map(_.toLong)
          .getOrElse(defaultRecvTimeUsec("syslog-parser")),
        badHostname = c.kwargs.get("bad-hostname"))
      ((df: DataFrame) => graft.parsers.SyslogFormat.stage(
        df, c.kwargs.getOrElse("value", "text"), o,
        prefix = c.kwargs.getOrElse("prefix", "sl_")), None)
    case "date-parser" =>
      // date-parser(format('%...') template()/value()): ordered strftime
      // format fallback into the event-time `ts` column
      // (modules/timestamp/date-parser)
      val fmts = c.kwargs.getOrElse("format",
        sys.error("date-parser: missing format()")).split(",").map(_.trim)
        .map(graft.functions.TemplateFunctions.strftimeToJava).toSeq
      ((df: DataFrame) => {
        val (d2, in) = parserInput(df, c)
        d2.withColumn("ts",
            FieldParsers.dateParser(col(in), fmts).cast("timestamp_ntz"))
          .drop(tmpInputCol)
      }, None)
    case "sdata-parser" =>
      // parse an SDATA-shaped field into the sdata/sdata_ids columns the
      // $SDATA macro renders (reference modules/sdata-parser)
      ((df: DataFrame) => {
        val p = graft.functions.GraftFunctions.sdata_parse(
          col(c.kwargs.getOrElse("value", "text")))
        df.withColumn("__sd", p)
          .withColumn("sdata_ids", col("__sd.sdata_ids"))
          .withColumn("sdata", col("__sd.sdata"))
          .drop("__sd")
      }, None)
    case "cisco-parser" =>
      val o = graft.parsers.SyslogFormat.Options(
        recvZone = c.kwargs.get("time-zone")
          .map(java.time.ZoneId.of).getOrElse(java.time.ZoneOffset.UTC),
        nowEpochUsec = c.kwargs.get("recv-time").map(_.toLong)
          .getOrElse(defaultRecvTimeUsec("cisco-parser")))
      ((df: DataFrame) => graft.parsers.CiscoParser.stage(
        df, c.kwargs.getOrElse("value", "text"), o,
        prefix = c.kwargs.getOrElse("prefix", "cisco_")), None)
    case "json-parser" =>
      ((df: DataFrame) => df.withColumn(c.kwargsOrFail("prefix"),
        FieldParsers.jsonParser(col(c.kwargs.getOrElse("value", "text")),
          c.args.head)), None)
    case "csv-parser" =>
      // dialect()/flags(escape-*) select the scanner FSM; columns() or
      // positional args name the outputs; quote-pairs("\"\"''") sets the
      // open/close quote alphabet; template() re-parses a derived value;
      // flags(drop-invalid) drops unmatched rows (modules/csvparser)
      val flagWords = Set("greedy", "strip-whitespace", "drop-invalid",
        "escape-none", "escape-backslash", "escape-backslash-with-sequences",
        "escape-double-char")
      val flags = c.kwargs.get("flags")
        .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty) ++
        c.args.filter(flagWords)
      val kwCols = c.kwargs.get("columns").map(_.split(",").map(_.trim).toSeq)
      val names = kwCols.getOrElse(c.args.filterNot(flagWords))
      val dialectName = c.kwargs.get("dialect")
        .orElse(flags.find(_.startsWith("escape-")))
      dialectName match {
        case None if (c.kwargs.keySet -- Set("value")).isEmpty =>
          ((df: DataFrame) => FieldParsers.csvParser(df,
            col(valueName(c.kwargs.getOrElse("value", "text"))), names), None)
        case d =>
          val dialect = d.getOrElse("escape-none") match {
            case "escape-none" => graft.parsers.Scanners.EscapeNone
            case "escape-backslash" => graft.parsers.Scanners.EscapeBackslash
            case "escape-backslash-with-sequences" => graft.parsers.Scanners.EscapeBackslashWithSequences
            case "escape-double-char" => graft.parsers.Scanners.EscapeDoubleChar
            case other => sys.error(s"unknown csv dialect: $other")
          }
          val qp = c.kwargs.get("quote-pairs")
          val opts = graft.parsers.Scanners.CsvOptions(
            delimiters = c.kwargs.getOrElse("delimiters", ","),
            quotesStart = qp.map(s => s.grouped(2).map(_.head).mkString).getOrElse("\"'"),
            quotesEnd = qp.map(s => s.grouped(2).map(_.last).mkString).getOrElse("\"'"),
            dialect = dialect,
            greedy = flags("greedy"),
            stripWhitespace = flags("strip-whitespace"),
            // null("-"): a field equal to the null marker scans as empty
            nullValue = c.kwargs.get("null").orNull)
          // typed columns (int("pid") …): scan as strings, then try_cast;
          // on-type-error(drop-property) nulls the uncastable value
          // (modules/csvparser typed columns + on-type-error policy)
          // prefix() prepends to every output column (SCL presets rely on it)
          val pfx = c.kwargs.getOrElse("prefix", "")
          val typed = names.map { n =>
            n.split(":", 2) match {
              case Array(t, base) if Set("int", "double", "datetime", "string")(t) =>
                (pfx + base, Some(t))
              case _ => (pfx + n, None)
            }
          }
          val plainNames = typed.map(_._1)
          c.kwargs.get("on-type-error").foreach(v => require(v == "drop-property",
            s"csv-parser: unsupported on-type-error($v) — drop-property only"))
          val f = (df0: DataFrame) => {
            val (df, in) = parserInput(df0, c)
            // reference csvparser partial-fills: scanned columns keep their
            // values even when later columns are missing (csvparser.c:292);
            // a second csv stage on the frame (two-pass SCL presets, if/else
            // branches) overwrites its outputs instead of duplicating them
            val base = df.drop((plainNames :+ "csv_invalid").filterNot(_ == in): _*)
            val scanned = graft.parsers.Scanners.csvStage(base, in, plainNames, opts,
              partialFill = true).drop(tmpInputCol)
            typed.foldLeft(scanned) {
              case (d, (n, Some("int")))      => d.withColumn(n, col(n).try_cast("bigint"))
              case (d, (n, Some("double")))   => d.withColumn(n, col(n).try_cast("double"))
              case (d, (n, Some("datetime"))) => d.withColumn(n, col(n).try_cast("timestamp_ntz"))
              case (d, _)                     => d
            }
          }
          (f, if (flags("drop-invalid")) Some((_: DataFrame) => !col("csv_invalid")) else None)
      }
    case "regexp-parser" =>
      // regexp-parser(patterns('re' …) [prefix() template() value()]) —
      // ordered first-match over the patterns, named captures (?<n>…) or
      // (?'n'…) promoted to prefixed top-level columns
      // (modules/regexp-parser). drop-invalid drops unmatched rows.
      val pats = c.kwargs.getOrElse("patterns",
        sys.error("regexp-parser: missing patterns()")).split("\u0000").toSeq
      val prefix = c.kwargs.getOrElse("prefix", "")
      val rules = pats.zipWithIndex.map { case (p0, i) =>
        val (p, names) = stripNamedGroups(p0)
        graft.parsers.GrokRule(s"re$i", p, names)
      }
      val dropInvalid = c.kwargs.get("flags").exists(_.contains("drop-invalid")) ||
        c.args.contains("drop-invalid")
      val f = (df0: DataFrame) => {
        val (df1, in) = parserInput(df0, c)
        // GrokStage owns fields/rule_id/tags — stash pre-existing ones
        val owned = Seq("fields", "rule_id", "tags").filter(df1.columns.contains)
        val stashed = owned.foldLeft(df1)((d, n) => d.withColumnRenamed(n, s"__pre_$n"))
        val parsed = GrokStage(stashed, in, rules)
        val captures = rules.flatMap(_.captures).distinct
          .filterNot(_.startsWith("__g")) // unnamed-group placeholders
        val promoted = captures.foldLeft(parsed)((d, n) =>
          d.withColumn(prefix + n, try_element_at(col("fields"), lit(n))))
          .withColumn(s"${prefix}re_invalid", col("rule_id").isNull)
        val cleaned = promoted.drop("fields", "rule_id", "tags", tmpInputCol)
        owned.foldLeft(cleaned)((d, n) => d.withColumnRenamed(s"__pre_$n", n))
      }
      (f, if (dropInvalid) Some((_: DataFrame) => !col(s"${prefix}re_invalid")) else None)
    case other => sys.error(s"unknown parser driver: $other")
  }

  /** PCRE `(?<name>…)` / `(?'name'…)` capture names → plain groups + a
    * positional name table (java.util.regex named groups reject '_', and
    * GrokRule names map by group index anyway). Unnamed capturing groups
    * get `__gN` placeholders, which the promotion step skips. Escapes and
    * character classes are honored during the scan.
    */
  private def stripNamedGroups(p: String): (String, Seq[String]) = {
    val sb = new StringBuilder
    val names = Seq.newBuilder[String]
    var i = 0
    var inClass = false
    var k = 0
    while (i < p.length) {
      val ch = p(i)
      if (ch == '\\' && i + 1 < p.length) { sb.append(p.substring(i, i + 2)); i += 2 }
      else if (inClass) { if (ch == ']') inClass = false; sb += ch; i += 1 }
      else if (ch == '[') { inClass = true; sb += ch; i += 1 }
      else if (ch == '(') {
        if (p.startsWith("(?<", i) && i + 3 < p.length &&
          p(i + 3) != '=' && p(i + 3) != '!') {
          val close = p.indexOf('>', i + 3)
          require(close > 0, s"unterminated (?< in: $p")
          names += p.substring(i + 3, close); sb += '('; i = close + 1; k += 1
        } else if (p.startsWith("(?'", i)) {
          val close = p.indexOf('\'', i + 3)
          require(close > 0, s"unterminated (?' in: $p")
          names += p.substring(i + 3, close); sb += '('; i = close + 1; k += 1
        } else if (p.startsWith("(?", i)) { sb += ch; i += 1 } // (?: lookarounds
        else { k += 1; names += s"__g$k"; sb += ch; i += 1 }
      } else { sb += ch; i += 1 }
    }
    (sb.toString, names.result())
  }

  private val tmpInputCol = "__parser_input"

  /** Resolve a parser's input: template() compiles against the frame (as a
    * temp column), else value() names a column, else `text`.
    */
  private def parserInput(df: DataFrame, c: Call): (DataFrame, String) =
    c.kwargs.get("template") match {
      case Some(t) =>
        (df.withColumn(tmpInputCol, templateValue(df, t, Map.empty)), tmpInputCol)
      case None => (df, valueName(c.kwargs.getOrElse("value", "text")))
    }

  private implicit class CallOps(val c: Call) extends AnyVal {
    def kwargsOrFail(k: String): String =
      c.kwargs.getOrElse(k, sys.error(s"${c.name}: missing $k()"))
  }

  /** value(MESSAGE) / value(MSG) in reference configs address the message
    * text; our transcript frames carry it as `text`. */
  private def valueName(n: String): String =
    if (n == "MESSAGE" || n == "MSG") "text" else n

  /** A rewrite/destination option value evaluated as a template (the
    * reference compiles every such value through log_template_compile):
    * `$name` resolves to a top-level column, else to the parsed `fields`
    * map; `$(NAME)` may call a config-defined `template NAME {…}` user
    * function. Values without `$` stay plain literals.
    */
  private def templateValue(df: DataFrame, text: String,
      user: Map[String, String]): Column =
    if (!text.contains("$")) lit(text)
    else graft.functions.Templates.compile(text, frameResolver(df), user)

  private def rewriteDriver(c: Call,
      user: () => Map[String, String] = () => Map.empty): DataFrame => DataFrame = c.name match {
    case "set" =>
      df => Rewrites.set(df, c.kwargsOrFail("value"), templateValue(df, c.args.head, user()),
        c.kwargs.get("condition").map(conditionPred(df, _, user())))
    case "subst" =>
      val flags = c.kwargs.get("flags")
        .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
      val global = flags("global") || c.args.contains("global")
      val target = valueName(c.kwargsOrFail("value"))
      // a function-bearing replacement is a per-match template
      // (store-matches binds $0..$n); plain strings go through the
      // codegen'd first/global regexp replace
      if (c.args(1).contains("$("))
        df => Rewrites.substTemplate(df, target, c.args(0), c.args(1), global,
          c.kwargs.get("condition").map(conditionPred(df, _, user())))
      else
        df => Rewrites.subst(df, target, c.args(0), c.args(1), global,
          c.kwargs.get("condition").map(conditionPred(df, _, user())))
    case "set-pri" | "set-severity" | "set-facility" =>
      df => {
        val base = if (df.columns.contains("pri")) df
          else df.withColumn("pri", lit(13))
        val v = templateValue(base, c.args.head, user())
        val cond = c.kwargs.get("condition").map(conditionPred(base, _, user()))
        c.name match {
          case "set-pri"      => Rewrites.setPri(base, "pri", v, cond)
          case "set-severity" => Rewrites.setSeverity(base, "pri", v, cond)
          case _              => Rewrites.setFacility(base, "pri", v, cond)
        }
      }
    case "set-tag" =>
      df => {
        val base = if (df.columns.contains("tags")) df
          else df.withColumn("tags", array().cast("array<string>"))
        Rewrites.setTag(base, "tags", lit(c.args.head),
          c.kwargs.get("condition").map(conditionPred(base, _, user())))
      }
    case "unset" => df => Rewrites.unset(df, c.kwargsOrFail("value"))
    case "rename" => df => Rewrites.rename(df, c.args(0), c.args(1))
    case other => sys.error(s"unknown rewrite driver: $other")
  }

  // ----------------------------------------------------------- top level
  /** Parse config text into the case-class Config (IR #1). */
  /** `@version: X.Y` pragma + `@include "path"` expansion (reference
    * lib/cfg-lex.l pragma handling + include resolution): pragmas are
    * recorded and stripped, includes splice the file's text in place
    * (recursively, cycle-guarded). Returns (expanded text, version or "").
    */
  def preprocess(text: String, seen: Set[String] = Set.empty): (String, String) = {
    var version = ""
    val defines = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val out = new StringBuilder
    text.linesIterator.foreach { line =>
      val t = line.trim
      if (t.startsWith("@version")) {
        version = t.stripPrefix("@version").stripPrefix(":").stripSuffix(";").trim
      } else if (t.startsWith("@define")) {
        // @define name 'value' — backtick `name` refs splice the value
        // (reference lib/cfg-lexer.c pragma @define + backtick subst)
        val rest = t.stripPrefix("@define").trim
        val name = rest.takeWhile(c => !c.isWhitespace)
        val raw = rest.drop(name.length).trim
        val v = if (raw.length >= 2 && (raw.head == '\'' || raw.head == '"') &&
          raw.last == raw.head) raw.substring(1, raw.length - 1) else raw
        defines(name) = v
      } else if (t.startsWith("@include")) {
        val path = t.stripPrefix("@include").trim
          .stripSuffix(";").stripPrefix("\"").stripSuffix("\"")
        require(!seen.contains(path), s"@include cycle: $path")
        val included = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
        val (expanded, v) = preprocess(included, seen + path)
        if (version.isEmpty) version = v
        out.append(expanded).append('\n')
      } else out.append(line).append('\n')
    }
    val substituted = defines.foldLeft(out.toString) { case (acc, (k, v)) =>
      acc.replace("`" + k + "`", v)
    }
    (substituted, version)
  }

  // ------------------------------------------------------ block generators

  private final case class BlockDef(
      ctx: String, name: String, params: Seq[(String, String)], body: String)

  /** Scan to the matching close char, honoring quoted strings. */
  private def matching(text: String, open: Int, oc: Char, cc: Char): Int = {
    var depth = 0
    var i = open
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '"' || c == '\'') {
        val close = text.indexOf(c, i + 1)
        require(close > 0, s"unterminated string at $i")
        i = close
      } else if (c == oc) depth += 1
      else if (c == cc) { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    sys.error(s"unbalanced $oc$cc from offset $open")
  }

  /** Parse `name1(value1) name2(value2) ...` - quotes stripped off values. */
  private def parseParamList(s: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    while (i < s.length) {
      if (s.charAt(i).isWhitespace || s.charAt(i) == ',') i += 1
      else {
        val j0 = i
        while (i < s.length && s.charAt(i) != '(') i += 1
        require(i < s.length, s"block param without (default): $s")
        val name = s.substring(j0, i).trim
        val close = matching(s, i, '(', ')')
        val raw = s.substring(i + 1, close).trim
        val v = if (raw.length >= 2 && (raw.head == '"' || raw.head == '\'') &&
          raw.last == raw.head) raw.substring(1, raw.length - 1) else raw
        out += name -> v
        i = close + 1
      }
    }
    out.result()
  }

  /** SCL block generators (reference lib/cfg-block.c + the scl conf library):
    * `block <ctx> <name>(p1(default) ...) { body with backtick-p1 refs };`
    * definitions are stripped; each later `name(p1(v) ...);` call splices
    * the body with backtick-params substituted (given args override
    * defaults). Blocks may call blocks - expansion iterates to fixpoint.
    */
  /** Remove #-comments (quote-aware) — expansion must not splice bodies
    * into commented-out text, and brace matching must not trip on
    * apostrophes inside comments. The lexer ignores comments anyway.
    */
  private def stripComments(text: String): String = {
    // java StringBuilder: scala's append(x, start, end) auto-tuples to
    // append(Any) and splices "(text,i,j)" instead of the slice
    val out = new java.lang.StringBuilder
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '"' || c == '\'') {
        val close = text.indexOf(c, i + 1)
        require(close > 0, s"unterminated string at $i")
        out.append(text, i, close + 1); i = close + 1
      } else if (c == '#') {
        while (i < text.length && text.charAt(i) != '\n') i += 1
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Is offset `idx` inside a quoted string? (quote-parity scan) */
  private def inString(text: String, idx: Int): Boolean = {
    var i = 0
    var q: Char = 0
    while (i < idx) {
      val c = text.charAt(i)
      if (q == 0 && (c == '"' || c == '\'')) q = c
      else if (c == q) q = 0
      i += 1
    }
    q != 0
  }

  def expandBlocks(text0: String): String = {
    var text = stripComments(text0)
    val blocks = scala.collection.mutable.LinkedHashMap.empty[String, BlockDef]
    // 1. strip definitions
    val defRe = """(?m)^\s*block\s+(\w+)\s+([\w.-]+)\s*\(""".r
    var m = defRe.findFirstMatchIn(text)
    while (m.isDefined) {
      val g = m.get
      val paramsClose = matching(text, g.end - 1, '(', ')')
      val bodyOpen = text.indexOf('{', paramsClose)
      require(bodyOpen > 0, s"block ${g.group(2)} has no body")
      val bodyClose = matching(text, bodyOpen, '{', '}')
      var end = bodyClose + 1
      while (end < text.length && (text.charAt(end) == ';' || text.charAt(end).isWhitespace)) end += 1
      blocks(g.group(2)) = BlockDef(g.group(1), g.group(2),
        parseParamList(text.substring(g.end, paramsClose)),
        text.substring(bodyOpen + 1, bodyClose))
      text = text.substring(0, g.start) + text.substring(end)
      m = defRe.findFirstMatchIn(text)
    }
    // 2. expand calls to fixpoint (nested block calls). Bounded total
    // expansion count: a self-recursive block must error, not hang
    var expansions = 0
    var changed = true
    while (changed) {
      changed = false
      blocks.values.foreach { b =>
        // left boundary: the name must not be a suffix of a longer
        // identifier (names may contain - and ., so \b is not enough)
        val callRe = ("""(?<![\w.-])""" + java.util.regex.Pattern.quote(b.name) + """\s*\(""").r
        var searchFrom = 0
        var cm = callRe.findFirstMatchIn(text.substring(searchFrom))
        while (cm.isDefined) {
          val c = cm.get
          val start = searchFrom + c.start
          val parenAt = searchFrom + c.end - 1
          if (inString(text, start)) {
            searchFrom = parenAt + 1 // quoted occurrence: not a call
          } else {
            expansions += 1
            require(expansions < 1000,
              s"block expansion did not terminate (recursive block ${b.name}?)")
            val argsClose = matching(text, parenAt, '(', ')')
            val args = parseParamList(text.substring(parenAt + 1, argsClose)).toMap
            // consume a trailing ';' (possibly whitespace-separated)
            var j = argsClose + 1
            while (j < text.length && text.charAt(j).isWhitespace) j += 1
            val end = if (j < text.length && text.charAt(j) == ';') j + 1 else argsClose + 1
            val subst = b.params.toMap ++ args
            val body = subst.foldLeft(b.body) { case (acc, (k, v)) =>
              acc.replace("`" + k + "`", v)
            }
            text = text.substring(0, start) + body + text.substring(end)
            changed = true
            searchFrom = 0
          }
          cm = callRe.findFirstMatchIn(text.substring(searchFrom))
        }
      }
    }
    text
  }

  /** Pull `filterx [name] { body }` blocks out of the text before lexing —
    * the filterx language has its own lexical rules ($refs, `==`/`=~`
    * operators, template strings) that the config lexer must not tokenize.
    * Each body is stashed under a `__fxN` key and the block is replaced
    * with `filterx [name] __fxN;`; the parser resolves the key back to the
    * raw body and hands it to [[graft.filterx.FilterX]].
    */
  private def extractFilterx(text0: String): (String, Map[String, String]) = {
    var text = text0
    val bodies = Map.newBuilder[String, String]
    var n = 0
    val re = """(?<![\w.-])filterx(\s+[\w.-]+)?\s*\{""".r
    var searchFrom = 0
    var m = re.findFirstMatchIn(text.substring(searchFrom))
    while (m.isDefined) {
      val g = m.get
      if (inString(text, searchFrom + g.start)) {
        searchFrom = searchFrom + g.end
        m = re.findFirstMatchIn(text.substring(searchFrom))
      } else {
      val open = searchFrom + g.end - 1
      val close = matching(text, open, '{', '}')
      val key = s"__fx$n"
      n += 1
      bodies += key -> text.substring(open + 1, close)
      val nameDecl = Option(g.group(1)).map(_.trim).getOrElse("")
      val repl =
        if (nameDecl.nonEmpty) s"filterx $nameDecl $key;" else s"filterx $key;"
      var end = close + 1
      while (end < text.length && text.charAt(end).isWhitespace) end += 1
      val stop = if (end < text.length && text.charAt(end) == ';') end + 1 else close + 1
      text = text.substring(0, searchFrom + g.start) + repl + text.substring(stop)
      searchFrom = 0
      m = re.findFirstMatchIn(text)
      }
    }
    (text, bodies.result())
  }

  /** A filterx block as log-path elements: the match predicate routes
    * (unmatched rows leave the path, filterx-pipe.c:74-80) and the variable
    * writes apply — Compiler.walk guards the transform with the frozen
    * predicate, giving the reference's "store only if matched" semantics.
    */
  private def filterxElements(body: String): Seq[Dsl.Element] = Seq(
    Dsl.FilterE(df => graft.filterx.FilterX.compile(df, body).matched),
    Dsl.TransformE { df =>
      val c = graft.filterx.FilterX.compile(df, body)
      val updated = df.columns.toSeq.map(n =>
        c.updates.find(_._1 == n).map(_._2.as(n)).getOrElse(col(n)))
      val added = c.updates.filterNot(u => df.columns.contains(u._1))
        .map { case (nm, v) => v.as(nm) }
      df.select(updated ++ added: _*)
    })

  def parse(text: String): Dsl.Config = {
    val (included, _) = preprocess(text)
    val expanded = expandBlocks(included)
    val (fxText, fxBodies) = extractFilterx(expanded)
    val filterxNamed = scala.collection.mutable.Map[String, String]()
    val p = new P(lex(fxText))
    val sources = Map.newBuilder[String, SparkSession => DataFrame]
    val filters = scala.collection.mutable.Map[String, DataFrame => Column]()
    val parsers = scala.collection.mutable.Map[String, DataFrame => DataFrame]()
    val parserKeeps = scala.collection.mutable.Map[String, Seq[DataFrame => Column]]()
    val rewrites = scala.collection.mutable.Map[String, DataFrame => DataFrame]()
    val dests = scala.collection.mutable.Map[String, String]()
    val userTemplates = scala.collection.mutable.Map[String, String]()
    val paths = Seq.newBuilder[Dsl.LogPath]

    def parseLogElements(): Seq[Dsl.Element] = {
      val els = Seq.newBuilder[Dsl.Element]
      while (!p.isPunct("}")) {
        p.ident() match {
          case "source"      => p.expect("("); p.ident(); p.expect(")") // handled by caller list
          case "filter"      => p.expect("("); els += Dsl.FilterE(filters(p.ident())); p.expect(")")
          case "parser" =>
            p.expect("(")
            val pn = p.ident()
            els += Dsl.TransformE(parsers(pn))
            // drop-invalid compiles to a PATH filter: the unmatched row is
            // routed out of this path only, never dropped from the frame
            parserKeeps.getOrElse(pn, Nil).foreach(k => els += Dsl.FilterE(k))
            p.expect(")")
          case "rewrite"     => p.expect("("); els += Dsl.TransformE(rewrites(p.ident())); p.expect(")")
          case "destination" => p.expect("("); els += Dsl.DestE(dests(p.ident())); p.expect(")")
          case "filterx" =>
            if (p.isPunct("(")) { // reference to a named top-level block
              p.expect("("); els ++= filterxElements(filterxNamed(p.ident())); p.expect(")")
            } else els ++= filterxElements(fxBodies(p.ident())) // inline body
          case "flags"       => p.expect("("); while (!p.isPunct(")")) p.next(); p.expect(")")
          case "junction" =>
            p.expect("{")
            val channels = Seq.newBuilder[Seq[Dsl.Element]]
            while (!p.isPunct("}")) {
              require(p.ident() == "channel", "junction body must be channels")
              p.expect("{"); channels += parseLogElements(); p.expect("}"); p.eat(";")
            }
            p.expect("}")
            els += Dsl.Junction(channels.result())
          case "log" =>
            // embedded log statements — CONSECUTIVE ones form one junction
            // (reference cfg-tree.c embedded log exprs); names make the
            // channels named routes with ingress/egress counters
            val chans = Seq.newBuilder[Seq[Dsl.Element]]
            val nms = Seq.newBuilder[Option[String]]
            def one(): Unit = {
              val nm = p.peek match {
                case Some(Ident(n)) => p.next(); Some(n)
                case _ => None
              }
              p.expect("{"); chans += parseLogElements(); p.expect("}"); p.eat(";")
              nms += nm
            }
            one()
            while (p.peek.contains(Ident("log"))) { p.next(); one() }
            els += Dsl.Junction(chans.result(), nms.result())
          case "if" =>
            val branches = Seq.newBuilder[(DataFrame => Column, Seq[Dsl.Element])]
            p.expect("("); val c0 = filterExpr(p, filters); p.expect(")")
            p.expect("{"); branches += c0 -> parseLogElements(); p.expect("}")
            var otherwise: Seq[Dsl.Element] = Nil
            var done = false
            while (!done) p.peek match {
              case Some(Ident("elif")) =>
                p.next(); p.expect("("); val c = filterExpr(p, filters); p.expect(")")
                p.expect("{"); branches += c -> parseLogElements(); p.expect("}")
              case Some(Ident("else")) =>
                p.next(); p.expect("{"); otherwise = parseLogElements(); p.expect("}")
              case _ => done = true
            }
            els += Dsl.IfElse(branches.result(), otherwise)
          case other => sys.error(s"unexpected log element: $other")
        }
        p.eat(";")
      }
      els.result()
    }

    while (p.peek.isDefined) {
      p.ident() match {
        case "source" =>
          val name = p.ident(); p.expect("{")
          val call = parseCall(p); p.eat(";"); p.expect("}")
          sources += name -> sourceDriver(call)
        case "filter" =>
          val name = p.ident(); p.expect("{")
          val e = filterExpr(p, filters); p.eat(";"); p.expect("}")
          filters(name) = e
        case "parser" =>
          val name = p.ident(); p.expect("{")
          var f: DataFrame => DataFrame = identity
          val keeps = Seq.newBuilder[DataFrame => Column]
          while (!p.isPunct("}")) {
            val c = parseCall(p); p.eat(";")
            val g = f
            val (d, keep) = parserDriver(c)
            f = df => d(g(df))
            keep.foreach(keeps += _)
          }
          parserKeeps(name) = keeps.result()
          p.expect("}")
          parsers(name) = f
        case "rewrite" =>
          val name = p.ident(); p.expect("{")
          var f: DataFrame => DataFrame = identity
          while (!p.isPunct("}")) { val c = parseCall(p); p.eat(";"); val g = f; val d = rewriteDriver(c, () => userTemplates.toMap); f = df => d(g(df)) }
          p.expect("}")
          rewrites(name) = f
        case "template" =>
          // template NAME { template("fmt"); [template-escape(no);] };
          // registered as a named template AND a $(NAME) user function
          // (reference lib/template/user-function.c)
          val name = p.ident(); p.expect("{")
          while (!p.isPunct("}")) {
            val c = parseCall(p); p.eat(";")
            c.name match {
              case "template" => userTemplates(name) = c.args.head
              case "template-escape" => () // no-op: we never shell-escape
              case other => sys.error(s"unexpected template option: $other")
            }
          }
          p.expect("}")
        case "destination" =>
          val name = p.ident(); p.expect("{")
          val call = parseCall(p); p.eat(";"); p.expect("}")
          dests(name) = call.args.headOption.getOrElse(name)
        case "filterx" =>
          val name = p.ident()
          filterxNamed(name) = fxBodies(p.ident())
        case "log" =>
          // optional path name: log top-level-1 { … }; (named route stats)
          val pathName = p.peek match {
            case Some(Ident(n)) => p.next(); Some(n)
            case _ => None
          }
          p.expect("{")
          // pre-scan for source()/flags() refs, then re-walk for elements
          val saved = p.toks
          val srcs = Seq.newBuilder[String]
          var flagSet = Set.empty[String]
          var depth = 1
          var scan = saved
          while (depth > 0 && scan.nonEmpty) {
            scan match {
              case Ident("source") :: Punct("(") :: Ident(s) :: Punct(")") :: rest if depth == 1 =>
                srcs += s; scan = rest
              case Ident("flags") :: Punct("(") :: rest if depth == 1 =>
                var r = rest
                while (r.nonEmpty && r.head != Punct(")")) {
                  r.head match { case Ident(f) => flagSet += f; case _ => () }; r = r.tail
                }
                scan = r
              case Punct("{") :: rest => depth += 1; scan = rest
              case Punct("}") :: rest => depth -= 1; scan = rest
              case _ :: rest => scan = rest
              case Nil => ()
            }
          }
          val els = parseLogElements()
          p.expect("}")
          paths += Dsl.LogPath(
            sources = srcs.result(),
            elements = els,
            isFinal = flagSet.contains("final"),
            isFallback = flagSet.contains("fallback"),
            isCatchAll = flagSet.contains("catch-all") || flagSet.contains("catchall"),
            name = pathName)
        case other => sys.error(s"unexpected top-level block: $other")
      }
      p.eat(";")
    }
    Dsl.Config(sources.result(), paths.result())
  }

  /** Parse + compile in one step. */
  def compile(spark: SparkSession, text: String): Compiler.Compiled =
    Compiler.compile(spark, parse(text))

  /** Parse + compile against a LIVE frame — the streaming entry: a ported
    * config's parse/filter/rewrite/route plan runs unchanged over a
    * `readStream` source. The config's `source` blocks still name the
    * paths' routing; the supplied stream plays the role of `sourceName`
    * (default: the config's first source). The returned
    * [[Compiler.Compiled]]'s `flagged`/`sink()` frames are streaming
    * DataFrames ready for `writeStream`/foreachBatch fan-out.
    */
  def compileStream(stream: DataFrame, text: String,
      sourceName: String = null): Compiler.Compiled = {
    val cfg = parse(text)
    val name = Option(sourceName)
      .orElse(cfg.sources.keys.headOption)
      .getOrElse(sys.error("config has no source block to impersonate"))
    require(cfg.sources.contains(name), s"unknown source name: $name")
    Compiler.compileFrame(stream.withColumn("__source", lit(name)), cfg)
  }
}
