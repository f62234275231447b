package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.util.regex.Pattern

/** First-occurrence regex substitution — the default mode of the reference's
  * `subst()` rewrite (reference lib/rewrite/rewrite-subst.c:50; `flags(global)`
  * opts into replace-all, which maps to Spark's built-in `regexp_replace`).
  *
  * Native Catalyst expression with whole-stage codegen: the compiled
  * `java.util.regex.Pattern` is cached in generated mutable state and only
  * recompiled when the regex value changes (same caching discipline as
  * Spark's own RegExpReplace), so the hot path is a single matcher call.
  */
@ExpressionDescription(
  usage = "regexp_replace_first(str, regexp, rep) - Replaces the first match of regexp in str with rep.")
case class RegexpReplaceFirst(subject: Expression, regexp: Expression, rep: Expression)
    extends TernaryExpression {

  override def first: Expression = subject
  override def second: Expression = regexp
  override def third: Expression = rep
  override def dataType: DataType = StringType
  override def nullable: Boolean =
    subject.nullable || regexp.nullable || rep.nullable

  @transient private var lastRegex: UTF8String = _
  @transient private var pattern: Pattern = _

  override def nullSafeEval(s: Any, r: Any, p: Any): Any = {
    val regexStr = r.asInstanceOf[UTF8String]
    if (pattern == null || !regexStr.equals(lastRegex)) {
      lastRegex = regexStr.clone()
      pattern = Pattern.compile(lastRegex.toString)
    }
    UTF8String.fromString(
      pattern.matcher(s.asInstanceOf[UTF8String].toString)
        .replaceFirst(p.asInstanceOf[UTF8String].toString))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val clsP = classOf[Pattern].getName
    val lastRegexVar = ctx.addMutableState("UTF8String", "graftLastRegex")
    val patternVar = ctx.addMutableState(clsP, "graftPattern")
    nullSafeCodeGen(ctx, ev, (s, r, p) => s"""
      if ($patternVar == null || !$r.equals($lastRegexVar)) {
        $lastRegexVar = $r.clone();
        $patternVar = $clsP.compile($lastRegexVar.toString());
      }
      ${ev.value} = UTF8String.fromString(
        $patternVar.matcher($s.toString()).replaceFirst($p.toString()));
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(subject = newFirst, regexp = newSecond, rep = newThird)
}

/** Column-level API for the engine's custom Catalyst expressions. */
object GraftFunctions {

  def regexp_replace_first(str: Column, regexp: String, rep: String): Column =
    Bridge.column(RegexpReplaceFirst(
      Bridge.expression(str),
      Bridge.expression(org.apache.spark.sql.functions.lit(regexp)),
      Bridge.expression(org.apache.spark.sql.functions.lit(rep))))
}
