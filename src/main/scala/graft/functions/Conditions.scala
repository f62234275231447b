package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.filters.Filters

/** The reference's filter-expression language as used by CONDITION arguments
  * of template functions — `$(if 'cond' then else)`, `$(grep 'cond' v…)`,
  * `$(filter (cond) list)` (reference lib/filter/filter-expr-parser.c via
  * modules/basicfuncs/cond-funcs.c tf_cond_parse_inner_expr) — compiled to a
  * boolean Column over a template [[Templates.Resolver]].
  *
  * Grammar (filter-expr-grammar.y subset meaningful per row):
  * {{{
  *   expr    := term ('or' term)*
  *   term    := fact ('and' fact)*
  *   fact    := 'not' fact | '(' expr ')' | cmp | call
  *   cmp     := operand OP operand
  *   OP      := eq ne lt le gt ge          (string compare, filter-cmp.c)
  *            | == != < <= > >=            (type-aware numeric-first)
  *            | === !==                    (type AND value equality)
  *   operand := '…' | "…" | bareword       (each side is a TEMPLATE)
  *   call    := facility(…) severity(…) level(…) program(…) host(…)
  *              message(…) match(… value(F)) tags(…) in-list(…) netmask(…)
  * }}}
  *
  * [[tryCompile]] returns None when the text does not parse as a condition
  * (the caller falls back to value truthiness — our historical curated
  * surface); semantic errors inside a PARSED condition (unknown filter
  * function, missing field) throw, like the reference's config-time check.
  */
object Conditions {

  // ------------------------------------------------------------------ lexer
  private sealed trait Tok
  private case class S(text: String) extends Tok // quoted operand (template)
  private case class W(text: String) extends Tok // bareword / ident
  private case class Op(sym: String) extends Tok // comparison punct
  private case object LP extends Tok
  private case object RP extends Tok

  private def lex(s: String): Option[List[Tok]] = {
    val out = List.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val close = s.indexOf(c, i + 1)
        if (close < 0) return None
        out += S(s.substring(i + 1, close)); i = close + 1
      } else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') { out += RP; i += 1 }
      else if (c == '=' || c == '!' || c == '<' || c == '>') {
        var j = i + 1
        while (j < s.length && s(j) == '=') j += 1
        val sym = s.substring(i, j)
        if (!Set("==", "===", "!=", "!==", "<", "<=", ">", ">=").contains(sym)) return None
        out += Op(sym); i = j
      } else {
        var j = i
        while (j < s.length && !s(j).isWhitespace &&
          !"()'\"=!<>".contains(s(j))) j += 1
        if (j == i) return None
        out += W(s.substring(i, j)); i = j
      }
    }
    Some(out.result())
  }

  private val identOps = Set("eq", "ne", "lt", "le", "gt", "ge")

  // ------------------------------------------------------------------- AST
  private sealed trait Ast
  private case class AOr(l: Ast, r: Ast) extends Ast
  private case class AAnd(l: Ast, r: Ast) extends Ast
  private case class ANot(e: Ast) extends Ast
  private case class ACmp(l: String, op: String, r: String) extends Ast
  private case class ACall(fn: String, args: Seq[String],
      kwargs: Map[String, String]) extends Ast

  private final class P(var toks: List[Tok]) {
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val t = toks.head; toks = toks.tail; t }
    def eat(t: Tok): Boolean =
      if (peek.contains(t)) { next(); true } else false
  }

  private def parseExpr(p: P): Option[Ast] = {
    var l = parseTerm(p).getOrElse(return None)
    while (p.peek.contains(W("or"))) {
      p.next(); l = AOr(l, parseTerm(p).getOrElse(return None))
    }
    Some(l)
  }

  private def parseTerm(p: P): Option[Ast] = {
    var l = parseFact(p).getOrElse(return None)
    while (p.peek.contains(W("and"))) {
      p.next(); l = AAnd(l, parseFact(p).getOrElse(return None))
    }
    Some(l)
  }

  private def parseFact(p: P): Option[Ast] = p.peek match {
    case Some(W("not")) => p.next(); parseFact(p).map(ANot)
    case Some(LP) =>
      p.next()
      val e = parseExpr(p).getOrElse(return None)
      if (p.eat(RP)) Some(e) else None
    case Some(S(l)) =>
      p.next(); parseCmpRest(p, l)
    case Some(W(w)) =>
      p.next()
      p.peek match {
        // a name containing '$' before '(' is a TEMPLATE call ($(fn …)),
        // not a filter call — the arg is not condition-shaped
        case Some(LP) if w.contains("$") => None
        case Some(LP) => parseCallArgs(p, w) // name(…) filter call
        case _        => parseCmpRest(p, w)  // bareword comparison operand
      }
    case _ => None
  }

  private def parseCmpRest(p: P, left: String): Option[Ast] = p.peek match {
    case Some(Op(sym)) =>
      p.next(); operand(p).map(r => ACmp(left, sym, r))
    case Some(W(w)) if identOps(w) =>
      p.next(); operand(p).map(r => ACmp(left, w, r))
    case _ => None // an operand alone is not a condition
  }

  private def operand(p: P): Option[String] = p.peek match {
    case Some(S(t)) => p.next(); Some(t)
    case Some(W(t)) if !identOps(t) && t != "and" && t != "or" && t != "not" =>
      p.next(); Some(t)
    case _ => None
  }

  private def parseCallArgs(p: P, fn: String): Option[Ast] = {
    if (!p.eat(LP)) return None
    val args = Seq.newBuilder[String]
    val kwargs = Map.newBuilder[String, String]
    while (!p.peek.contains(RP)) {
      p.next() match {
        case W(k) if p.peek.contains(LP) =>
          // kwarg; multi-value lists (flags(prefix, ignore-case)) join on ','
          p.next()
          val vals = Seq.newBuilder[String]
          while (!p.peek.contains(RP)) {
            p.next() match {
              case S(t) => vals += t
              case W(t) => vals += t.stripSuffix(",")
              case _    => return None
            }
          }
          if (!p.eat(RP)) return None
          kwargs += k -> vals.result().mkString(",")
        case S(t) => args += t
        case W(t) => args += t.stripSuffix(",") // tolerate comma separators
        case _    => return None
      }
    }
    p.next() // RP
    Some(ACall(fn, args.result(), kwargs.result()))
  }

  // ---------------------------------------------------------------- compile

  /** None when `text` is not condition-shaped; the compiled boolean Column
    * otherwise (semantic errors throw).
    */
  def tryCompile(text: String, resolver: Templates.Resolver,
      user: Map[String, String] = Map.empty): Option[Column] = {
    val toks = lex(text).getOrElse(return None)
    if (toks.isEmpty) return None
    val p = new P(toks)
    val ast = parseExpr(p).getOrElse(return None)
    if (p.toks.nonEmpty) return None // trailing garbage: not a condition
    Some(compile(ast, resolver, user))
  }

  private def compile(a: Ast, res: Templates.Resolver,
      user: Map[String, String]): Column = a match {
    case AOr(l, r)  => compile(l, res, user) || compile(r, res, user)
    case AAnd(l, r) => compile(l, res, user) && compile(r, res, user)
    case ANot(e)    => !compile(e, res, user)
    case ACmp(l, op, r) =>
      val lc = Templates.compile(l, res, user)
      val rc = Templates.compile(r, res, user)
      op match {
        case "eq" | "ne" | "lt" | "le" | "gt" | "ge" => Filters.cmpString(lc, rc, op)
        case "===" => Filters.cmpTypedEq(lc, rc)
        case "!==" => !Filters.cmpTypedEq(lc, rc)
        case sym   => Filters.cmpTypeAware(lc, rc, sym)
      }
    case ACall(fn, args, kwargs) =>
      def field(name: String): Column =
        res(name).getOrElse(sys.error(s"condition references unknown field: $name"))
      def m = Filters.matcher(args.head, kwargs.getOrElse("type", "pcre"),
        kwargs.get("flags").map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty))
      fn match {
        case "match"    => m(field(kwargs.getOrElse("value", "text")))
        case "host"     => m(field("host"))
        case "program"  => m(field("prog"))
        case "message"  => m(field("text"))
        case "facility" => Filters.facility(field("pri").cast("int"), args: _*)
        case "severity" | "level" =>
          val Array(lo, hi) = (if (args.head.contains("..")) args.head
            else s"${args.head}..${args.head}").split("\\.\\.")
          Filters.severityRange(field("pri").cast("int"), lo, hi)
        case "tags"    => Filters.hasAnyTag(field("tags"), args: _*)
        case "in-list" => Filters.inList(field(args.head), args.tail)
        case "netmask" => Filters.netmask(field(kwargs.getOrElse("value", "saddr")), args.head)
        case other => sys.error(s"unknown filter function in condition: $other(…)")
      }
  }
}
