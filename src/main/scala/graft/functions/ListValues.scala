package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** syslog-ng LIST values — the comma-separated string encoding every
  * `$(list-*)` template function speaks (reference
  * lib/scanner/list-scanner/list-scanner.c for parsing and
  * lib/str-repr/encode.c for rendering, exercised by
  * modules/basicfuncs/tests/test_basicfuncs.c test_list_funcs):
  *
  *  - elements may be double- or single-quoted with backslash escapes
  *    (`\t \n \r \b \f \\ \" \'`); `"foo,",bar` is the 2-list [`foo,`, bar]
  *  - UNQUOTED empty elements drop (`foo,` is the 1-list [foo]); a quoted
  *    `""` survives as an explicit empty element
  *  - encoding quotes an element when it is empty or contains a comma,
  *    whitespace escapes, a backslash or a quote; `"` is preferred, `'`
  *    when the value contains `"` but no `'`
  */
object ListValues {

  def scan(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"' || c == '\'') {
        val q = c
        val sb = new java.lang.StringBuilder
        i += 1
        var closed = false
        while (!closed && i < n) {
          val ch = s.charAt(i)
          if (ch == q) { closed = true; i += 1 }
          else if (ch == '\\' && i + 1 < n) {
            sb.append(s.charAt(i + 1) match {
              case 'b' => '\b'; case 'f' => '\f'; case 'n' => '\n'
              case 'r' => '\r'; case 't' => '\t'; case other => other
            })
            i += 2
          } else { sb.append(ch); i += 1 }
        }
        out += sb.toString // a quoted "" is an explicit empty element
        while (i < n && s.charAt(i) != ',') i += 1
        if (i < n) i += 1
      } else {
        val j0 = i
        while (i < n && s.charAt(i) != ',') i += 1
        if (i > j0) out += s.substring(j0, i)
        if (i < n) i += 1
      }
    }
    out.result()
  }

  private def escaped(v: String, alsoQuote: Char): String = {
    val sb = new java.lang.StringBuilder
    v.foreach {
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\\' => sb.append("\\\\")
      case ch if ch == alsoQuote => sb.append('\\').append(ch)
      case ch => sb.append(ch)
    }
    sb.toString
  }

  def encodeElem(v: String): String = {
    if (v.isEmpty) return "\"\""
    val hasQuote = v.contains('"')
    val hasApos = v.contains('\'')
    val needsQuoting = hasQuote || hasApos ||
      v.exists(ch => ch == ',' || ch == ' ' || ch == '\\' ||
        ch == '\b' || ch == '\f' || ch == '\n' || ch == '\r' || ch == '\t')
    if (!needsQuoting) v
    else if (hasQuote && !hasApos) "'" + escaped(v, '\'') + "'"
    else "\"" + escaped(v, '"') + "\""
  }

  def encode(l: Seq[String]): String = l.map(encodeElem).mkString(",")

  // ---------------------------------------------------------- expressions

  /** Static entry points for generated code (kept codegen-friendly so list
    * functions don't break whole-stage spans).
    */
  def scanToArray(s: UTF8String): GenericArrayData =
    new GenericArrayData(scan(s.toString).map(UTF8String.fromString).toArray[Any])

  def encodeArray(a: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < a.numElements()) {
      if (i > 0) sb.append(',')
      val e = a.getUTF8String(i)
      sb.append(encodeElem(if (e == null) "" else e.toString))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  case class ListScan(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(s: Any): Any = scanToArray(s.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.ListValues.scanToArray($s);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class ListEncode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(a: Any): Any =
      encodeArray(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.ListValues.encodeArray($a);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def list_scan(c: Column): Column = Bridge.column(ListScan(Bridge.expression(c)))
  def list_encode(c: Column): Column = Bridge.column(ListEncode(Bridge.expression(c)))
}
