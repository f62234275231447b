package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
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

/** Left-to-right dot product of two numeric arrays in double precision —
  * the hot inner loop of every embedding operator (cosine verify, top-k,
  * k-means assignment, hyperplane signatures).
  *
  * A native codegen expression instead of `zip_with` + `aggregate`: the
  * higher-order-function pair allocates an intermediate array and boxes
  * every element per evaluation; at LSH candidate-verification volume
  * (millions of pairs × vector dim) that interpretation dominates the
  * query. This is a primitive loop — no allocation, no boxing — with
  * IDENTICAL semantics: null if either array is null, if lengths differ
  * (zip_with pads with null, poisoning the fold), or if any element is
  * null; summation strictly left-to-right in double (the determinism
  * contract shared with the DuckDB oracle's `list_sum`).
  */
@ExpressionDescription(
  usage = "vec_dot(a, b) - Double-precision sequential dot product of two numeric arrays.")
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (tx, ty) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += numAt(x, i, tx) * numAt(y, i, ty)
      i += 1
    }
    acc
  }

  private def numAt(a: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case other => sys.error(s"vec_dot: unsupported element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val getA = CodeGenerator.getValue(a, elemType(left), i)
      val getB = CodeGenerator.getValue(b, elemType(right), i)
      s"""
      int $n = $a.numElements();
      if ($n != $b.numElements()) { ${ev.isNull} = true; }
      else {
        double $acc = 0.0; boolean $bad = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
          $acc += ((double)($getA)) * ((double)($getB));
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `numHashes` MinHash minima of a shingle-string array in ONE pass —
  * the affine 2-hash family `(h1 + j·h2) mod p` where h1/h2 are the
  * 60-bit/52-bit halves of each shingle's md5 (hex chars 1-15 and 17-29,
  * matching `conv(substring(md5(s),…),16,10)` exactly, so the signature
  * values — and therefore every LSH band bucket — are bit-identical to the
  * composed-builtins formulation).
  *
  * Replaces numHashes separate `array_min(transform(…))` evaluations (each
  * an interpreted traversal with per-element boxing) and the double
  * `md5(s)` per shingle: one digest and one running-minima update per
  * shingle. Returns null for a null array or when no shingle contributes
  * (unreachable behind the word-count pre-filter).
  */
@ExpressionDescription(
  usage = "minhash_sig(shingles, numHashes, prime) - All MinHash minima in one pass.")
case class MinhashSig(child: Expression, numHashes: Int, prime: Long)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val minima = Array.fill(numHashes)(Long.MaxValue)
    var contributed = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        contributed = true
        val md = digest.get()
        md.reset()
        val bytes = md.digest(arr.getUTF8String(i).getBytes)
        // hex chars 1-15 (60 bits) and 17-29 (52 bits), 1-indexed
        var h1 = 0L
        var k = 0
        while (k < 15) { h1 = (h1 << 4) | hexVal(bytes, k); k += 1 }
        var h2 = 0L
        k = 16
        while (k < 29) { h2 = (h2 << 4) | hexVal(bytes, k); k += 1 }
        var j = 0
        while (j < numHashes) {
          val v = (h1 + j * h2) % prime // operands positive: pmod == %
          if (v < minima(j)) minima(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!contributed) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(minima)
  }

  /** Value of the `k`-th hex character of the digest (2 chars per byte). */
  private def hexVal(bytes: Array[Byte], k: Int): Long = {
    val b = bytes(k >> 1) & 0xff
    (if ((k & 1) == 0) b >> 4 else b & 0xf).toLong
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Regex substitution whose replacement is a TEMPLATE evaluated per match
  * with `$0`..`$n` bound to the capture groups — the reference's subst()
  * with flags(store-matches) and a function-bearing replacement (the
  * cc-mask SCL's `$(substr $0 0 6)******$(substr $0 -4 4)`). Built-in
  * `regexp_replace` replacement syntax can only splice groups; it cannot
  * apply functions to them.
  */
case class RegexpSubstTemplate(child: Expression, regex: String, tmpl: String,
    global: Boolean)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StringType

  @transient private lazy val pattern = Pattern.compile(regex)
  @transient private lazy val render = MatchTemplates.compile(tmpl)

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    val m = pattern.matcher(str)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder
    var last = 0
    var more = true
    while (more) {
      sb.append(str, last, m.start())
      sb.append(render(i => if (i <= m.groupCount) Option(m.group(i)) else None))
      last = m.end()
      more = global && m.find()
    }
    sb.append(str, last, str.length)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** C-style `%.Nf` rendering of a double. glibc printf prints the EXACT
  * binary expansion of the double rounded half-even at the Nth decimal
  * (0.34000000000000030198), while `java.util.Formatter` pads the shortest
  * decimal representation with zeros (0.34000000000000030000) — so
  * `format_string` cannot reproduce the reference's number rendering
  * (numeric-funcs.c format_number prints doubles with precision 20).
  */
case class FormatFixed(child: Expression, precision: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(d: Any): Any =
    UTF8String.fromString(FormatFixed.render(d.asInstanceOf[Double], precision))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d =>
      s"${ev.value} = UTF8String.fromString(" +
        s"graft.functions.FormatFixed.render($d, $precision));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FormatFixed {
  def render(d: Double, precision: Int): String =
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "inf"
    else if (d.isNegInfinity) "-inf"
    else new java.math.BigDecimal(d)
      .setScale(precision, java.math.RoundingMode.HALF_EVEN).toPlainString
}

/** Distinct word k-shingles of a text — the codegen form of
  * `array_distinct(transform(sequence(1, n-k+1), i => concat_ws(" ",
  * element_at(w, i)…)))` over `w = split(text, " ")`. The composed
  * builtins are higher-order functions, which Catalyst CANNOT codegen
  * (CodegenFallback): the lambda re-evaluates the `split` child per
  * element per element_at — measured ~500 CPU-seconds for 235k shingles
  * at k = 8. This expression does one tight JVM pass per row inside the
  * whole-stage span (static-helper call, same idiom as [[FormatFixed]]).
  *
  * Semantics identical to the composed form, bit for bit: Spark
  * `split(" ", -1)` token rules (empty tokens kept, `""` → `[""]`),
  * shingles joined with one space, first-occurrence distinct order,
  * fewer than k words → empty array, null text → empty array (the
  * `when(size(w) >= k, …).otherwise(array())` null path).
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 1, s"shingle k must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  // not nullSafeEval: a null text maps to an EMPTY ARRAY (the composed
  // form's when(...).otherwise(array()) null path), never to null
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    WordShingles.compute(child.eval(input).asInstanceOf[UTF8String], k)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  def compute(text: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (text == null)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val w = text.toString.split(" ", -1)
    if (w.length < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + k <= w.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(w(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = UTF8String.fromString(it.next()); x += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Repetition-based quality signals (the Gopher/MassiveText rule family,
  * Rae et al. 2021 Table A1) in ONE per-row pass — a scan-stage expression,
  * no shuffle, no explode-to-word-rows (an exploded groupBy(doc, gram)
  * would shuffle ~10 gram rows per word at 100 TB for a per-document
  * scalar). Same static-helper idiom as [[WordShingles]].
  *
  * Signals (13 doubles, engine-portable integer-ratio math):
  *  - dup_line_frac / dup_para_frac: (units − distinct units) / units,
  *    lines split on "\n", paragraphs on "\n\n"
  *  - dup_line_char_frac / dup_para_char_frac: chars in unit occurrences
  *    BEYOND the first / total unit chars
  *  - top_{2,3,4}gram_char_frac: count(top gram) × chars(top gram) /
  *    text chars; ties break to the lexicographically smallest gram
  *  - dup_{5..10}gram_char_frac: chars of words covered by ≥1 occurrence
  *    of a gram appearing ≥2 times (position-union, each word counted
  *    once) / text chars
  *
  * Words split on `\s+` (Gopher's whitespace tokens — NOT the single-space
  * [[TextStats]] convention, because the planted line structure introduces
  * newlines); lengths are code points (DuckDB length() parity). Null or
  * empty text → all-zero row.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = RepetitionStats.schema
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    RepetitionStats.compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {
  val fieldNames: Seq[String] =
    Seq("dup_line_frac", "dup_line_char_frac", "dup_para_frac", "dup_para_char_frac") ++
      Seq(2, 3, 4).map(n => s"top_${n}gram_char_frac") ++
      (5 to 10).map(n => s"dup_${n}gram_char_frac")

  val schema: StructType =
    StructType(fieldNames.map(StructField(_, DoubleType, nullable = false)))

  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  /** (dup unit frac, dup unit char frac) for lines or paragraphs. */
  private def dupUnitStats(units: Array[String]): (Double, Double) = {
    if (units.length == 0) return (0.0, 0.0)
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < units.length) {
      counts.merge(units(i), 1, (a, b) => Integer.valueOf(a + b)); i += 1
    }
    var dupChars = 0L
    var totChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val len = cp(e.getKey)
      totChars += len * e.getValue
      if (e.getValue >= 2) dupChars += len * (e.getValue - 1)
    }
    ((units.length - counts.size).toDouble / units.length,
      if (totChars > 0) dupChars.toDouble / totChars else 0.0)
  }

  private def grams(words: Array[String], n: Int): Array[String] = {
    if (words.length < n) return Array.empty
    val out = new Array[String](words.length - n + 1)
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  private def gramCounts(g: Array[String]): java.util.HashMap[String, Int] = {
    val counts = new java.util.HashMap[String, Int](g.length * 2)
    var i = 0
    while (i < g.length) { counts.merge(g(i), 1, (a, b) => Integer.valueOf(a + b)); i += 1 }
    counts
  }

  def compute(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val out = new Array[Any](fieldNames.length)
    java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], java.lang.Double.valueOf(0.0))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
    if (text == null) return row
    val s = text.toString
    if (s.isEmpty) return row
    val totalChars = cp(s).toDouble

    val (dlf, dlcf) = dupUnitStats(s.split("\n", -1))
    val (dpf, dpcf) = dupUnitStats(s.split("\n\n", -1))
    out(0) = dlf; out(1) = dlcf; out(2) = dpf; out(3) = dpcf

    val words = s.split("\\s+", -1)
    val wordChars = words.map(cp) // memoized: covered-position sums reuse it

    // top n-gram char fraction, n = 2..4
    var n = 2
    while (n <= 4) {
      val g = grams(words, n)
      if (g.nonEmpty) {
        val counts = gramCounts(g)
        var bestCount = 0
        var bestGram: String = null
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > bestCount ||
              (e.getValue == bestCount && e.getKey.compareTo(bestGram) < 0)) {
            bestCount = e.getValue; bestGram = e.getKey
          }
        }
        out(4 + (n - 2)) = bestCount * cp(bestGram).toDouble / totalChars
      }
      n += 1
    }

    // duplicated n-gram coverage char fraction, n = 5..10
    n = 5
    while (n <= 10) {
      val g = grams(words, n)
      if (g.nonEmpty) {
        val counts = gramCounts(g)
        val covered = new Array[Boolean](words.length)
        var i = 0
        while (i < g.length) {
          if (counts.get(g(i)) >= 2) {
            var j = i
            while (j < i + n) { covered(j) = true; j += 1 }
          }
          i += 1
        }
        var chars = 0L
        i = 0
        while (i < words.length) { if (covered(i)) chars += wordChars(i); i += 1 }
        out(7 + (n - 5)) = chars.toDouble / totalChars
      }
      n += 1
    }
    row
  }
}

/** `sdata-parser()` — one SDATA-shaped string (quoted or unquoted param
  * values) to `struct<sdata_ids: array<string>, sdata: map<string,string>>`
  * with `id.param` map keys, null when the value is not SDATA (the
  * reference's modules/sdata-parser over syslog-format.c's SD scanner).
  * The $SDATA macro renders these two columns back to `[id k="v" …]`.
  */
case class SdataParse(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("sdata_ids", ArrayType(StringType)),
    StructField("sdata", MapType(StringType, StringType))))

  override def nullSafeEval(s: Any): Any =
    graft.parsers.SyslogFormat.parseSdata(s.asInstanceOf[UTF8String].toString) match {
      case None => null
      case Some((ids, pairs)) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            ids.map(UTF8String.fromString).toArray[Any]),
          new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              pairs.map(kv => UTF8String.fromString(kv._1)).toArray[Any]),
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              pairs.map(kv => UTF8String.fromString(kv._2)).toArray[Any]))))
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API for the engine's custom Catalyst expressions. */
object GraftFunctions {

  def sdata_parse(str: Column): Column =
    Bridge.column(SdataParse(Bridge.expression(str)))

  def repetition_stats(text: Column): Column =
    Bridge.column(RepetitionStats(Bridge.expression(text)))

  def format_fixed(d: Column, precision: Int): Column =
    Bridge.column(FormatFixed(Bridge.expression(d), precision))

  def regexp_replace_first(str: Column, regexp: String, rep: String): Column =
    Bridge.column(RegexpReplaceFirst(
      Bridge.expression(str),
      Bridge.expression(org.apache.spark.sql.functions.lit(regexp)),
      Bridge.expression(org.apache.spark.sql.functions.lit(rep))))

  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))

  def minhash_sig(shingles: Column, numHashes: Int, prime: Long): Column =
    Bridge.column(MinhashSig(Bridge.expression(shingles), numHashes, prime))

  def word_shingles(text: Column, k: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), k))

  def regexp_subst_template(str: Column, regex: String, tmpl: String,
      global: Boolean): Column =
    Bridge.column(RegexpSubstTemplate(Bridge.expression(str), regex, tmpl, global))
}
