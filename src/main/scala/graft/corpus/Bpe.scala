package graft.corpus

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, arXiv:1508.07909)
  * — train real merges on a corpus, tokenize documents with them. The
  * missing piece between [[TextStats.bpeTokenEstimate]] (a cost heuristic)
  * and an actual subword stream for token-budget packing and vocabulary
  * work.
  *
  * Split of labor at scale:
  *  - [[train]]'s distributed half is ONE word-count aggregate (explode →
  *    combinable count, the q_corpus_vocab shape); the greedy merge loop
  *    is inherently sequential (each merge depends on the last) and runs
  *    on the DRIVER over the top-`maxVocabWords` word-count table — the
  *    standard way BPE is trained (reference implementations run exactly
  *    this loop over a word-count dict); truncation to the top table is
  *    the documented approximation and covers the frequency mass.
  *  - [[encode]] is a scan-stage expression carrying the rank table in the
  *    plan (a few MB for 50k merges — task-broadcast with the closure);
  *    per word it repeatedly merges the LOWEST-RANK adjacent pair (the
  *    GPT-2 apply loop). No shuffle, no UDF registry — the
  *    [[graft.functions.WordShingles]] static-helper idiom.
  *
  * Pre-tokenization: whitespace runs; each word becomes its code points +
  * the `</w>` end-of-word symbol (Sennrich's marker), so merges never
  * cross word boundaries. Ties in training break deterministically
  * (count desc, then pair lexicographic asc).
  */
object Bpe {

  val EndOfWord = "</w>"

  /** A word as code-point symbols + the end marker. */
  def symbols(w: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += EndOfWord
    out.toArray
  }

  /** Merge every adjacent occurrence of `pair`, left to right. */
  def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Train `numMerges` merges on a corpus. Distributed word counting, then
    * the sequential greedy loop on the driver over the top
    * `maxVocabWords` (count desc, word asc) word types. */
  def train(
      corpus: DataFrame, text: Column,
      numMerges: Int, maxVocabWords: Int = 50000): Seq[(String, String)] = {
    require(numMerges >= 0 && maxVocabWords >= 1)
    val wordCounts = corpus.select(explode(split(text, "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab: Array[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (symbols(w), c) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val pc = mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- vocab) {
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val best = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, c) => (mergePair(syms, best), c) }
      }
    }
    merges.toSeq
  }

  /** Tokenize one word with trained ranks: repeatedly merge the
    * lowest-rank adjacent pair until none applies. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = symbols(word)
    var go = syms.length >= 2
    while (go) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bi = i }
        i += 1
      }
      if (bi < 0) go = false
      else {
        syms = mergePair(syms, (syms(bi), syms(bi + 1)))
        go = syms.length >= 2
      }
    }
    syms
  }

  def encodeText(text: UTF8String, ranks: Map[(String, String), Int]): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val words = text.toString.split("\\s+").filter(_.nonEmpty)
    val out = mutable.ArrayBuffer.empty[Any]
    for (w <- words; t <- encodeWord(w, ranks)) out += UTF8String.fromString(t)
    new GenericArrayData(out.toArray)
  }

  /** Tokens column: `array<string>` of subword units under `merges`. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(text),
      merges.zipWithIndex.toMap))

  /** Trained token count — the real version of the `bpeTokenEstimate`
    * heuristic. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encode(text, merges))

  /** Token-string → id table: id 0 is reserved for <unk> (a symbol outside
    * the training character set), then the corpus's base code-point
    * symbols + the `</w>` marker in sorted order, then the merge products
    * in rank order — the GPT-2 vocabulary layout. One distributed
    * distinct-characters pass over the training corpus. (Base extraction
    * splits on UTF-16 units, so non-BMP code points land in <unk> unless a
    * merge produced them — acceptable for the text corpora this targets.)
    */
  def vocab(
      corpus: DataFrame, text: Column,
      merges: Seq[(String, String)]): Map[String, Int] = {
    val baseChars = corpus
      .select(explode(split(text, "")).as("c"))
      .filter(col("c") =!= "" && col("c") =!= " ")
      .distinct().collect().map(_.getString(0))
    val base = (baseChars.toSeq :+ EndOfWord).distinct.sorted
    val products = merges.map { case (a, b) => a + b }
    (("<unk>" +: base) ++ products).zipWithIndex.toMap
  }

  /** Token-id column: `array<int>` under `merges` + `vocab`; tokens
    * outside the vocabulary map to id 0 (<unk>). */
  def encodeIds(
      text: Column, merges: Seq[(String, String)],
      vocab: Map[String, Int]): Column =
    Bridge.column(BpeEncodeIds(Bridge.expression(text),
      merges.zipWithIndex.toMap, vocab))
}

/** Scan-stage BPE apply; the rank table rides the serialized plan. Null
  * text → empty token array (matches the repo's shingle convention). */
case class BpeEncode(child: Expression, ranks: Map[(String, String), Int])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    Bpe.encodeText(child.eval(input).asInstanceOf[UTF8String], ranks)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE apply + vocabulary lookup in one pass; unknown tokens → 0. */
case class BpeEncodeIds(
    child: Expression, ranks: Map[(String, String), Int], vocab: Map[String, Int])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val t = child.eval(input).asInstanceOf[UTF8String]
    if (t == null) return new GenericArrayData(Array.empty[Any])
    val words = t.toString.split("\\s+").filter(_.nonEmpty)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    for (w <- words; tok <- Bpe.encodeWord(w, ranks))
      out += Integer.valueOf(vocab.getOrElse(tok, 0))
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
