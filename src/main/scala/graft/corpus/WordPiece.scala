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

/** WordPiece tokenizer (Schuster & Nakajima 2012; Wu et al. 2016
  * arXiv:1609.08144 §4.1; the BERT tokenizer) — the third member of the
  * subword family next to [[Bpe]] (frequency-greedy merges) and
  * [[Unigram]] (EM-pruned pieces). WordPiece differs from BPE in BOTH
  * halves:
  *
  *  - TRAIN picks the merge maximizing the unigram-LM LIKELIHOOD gain,
  *    score(a,b) = count(ab) / (count(a)·count(b)) — a rare pair of rare
  *    symbols can beat a frequent pair of frequent ones; continuation
  *    symbols carry the `##` prefix and merging strips the right side's
  *    marker (`a`+`##b` → `ab`, `##a`+`##b` → `##ab`).
  *  - APPLY ignores merge order entirely: greedy LONGEST-match-first
  *    against the vocabulary per word; a word with any unmatchable tail
  *    becomes one `[UNK]` token (BERT's WordpieceTokenizer semantics).
  *
  * Split of labor at scale — the [[Bpe.train]] contract verbatim: the
  * distributed half is ONE word-count aggregate; the sequential merge
  * loop runs on the driver over the top-`maxVocabWords` word types; apply
  * is a scan-stage expression whose vocabulary rides the serialized plan.
  * [[pairScores]] exposes the first iteration's scoring as a DataFrame
  * aggregate (two counts + broadcast-sized joins) — the oracle-checkable
  * face of the trainer, and exactly what the driver loop computes.
  *
  * Determinism: ties break by (score desc, left asc, right asc); the
  * score is a single IEEE division of exact integer counts (products stay
  * < 2^53 for any real corpus), so every engine computes the identical
  * double and the ranking is reproducible bit-for-bit.
  */
object WordPiece {

  val Unk = "[UNK]"
  val Cont = "##"

  /** Trained model: the vocabulary + the longest piece length (bounds the
    * greedy matcher's window). */
  final case class Model(vocab: Set[String], merges: Seq[(String, String)]) {
    /** longest piece in CHARACTERS (## prefix excluded). */
    val maxPieceChars: Int =
      if (vocab.isEmpty) 1
      else vocab.iterator.map(t => t.stripPrefix(Cont).length).max
  }

  /** A word as code-point symbols: first bare, the rest `##`-prefixed. */
  def symbols(w: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val s = new String(Character.toChars(cp))
      out += (if (i == 0) s else Cont + s)
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Merge every adjacent (a,b), left to right; the merged symbol strips
    * the right side's continuation marker. */
  def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val merged = pair._1 + pair._2.stripPrefix(Cont)
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += merged
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Train `numMerges` likelihood-greedy merges; the vocabulary is the
    * corpus alphabet (initial + `##` continuation forms) plus the merge
    * products. Distributed word counting, then the driver loop over the
    * top `maxVocabWords` (count desc, word asc) word types. */
  def train(
      corpus: DataFrame, text: Column,
      numMerges: Int, maxVocabWords: Int = 50000): Model = {
    require(numMerges >= 0 && maxVocabWords >= 1)
    val wordCounts = corpus.select(explode(split(text, "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromWordCounts(wordCounts, numMerges)
  }

  /** The driver half of [[train]], callable on a local word table (spec
    * surface + the exact loop the distributed path runs). */
  def trainFromWordCounts(
      wordCounts: Array[(String, Long)], numMerges: Int): Model = {
    var table: Array[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (symbols(w), c) }
    val alphabet = table.flatMap(_._1).distinct.sorted
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val pc = mutable.HashMap.empty[(String, String), Long]
      val sc = mutable.HashMap.empty[String, Long]
      for ((syms, c) <- table) {
        var i = 0
        while (i < syms.length) {
          sc.update(syms(i), sc.getOrElse(syms(i), 0L) + c)
          if (i + 1 < syms.length) {
            val k = (syms(i), syms(i + 1))
            pc.update(k, pc.getOrElse(k, 0L) + c)
          }
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val best = pc.toSeq.minBy { case ((a, b), n) =>
          (-n.toDouble / (sc(a).toDouble * sc(b).toDouble), a, b)
        }._1
        merges += best
        table = table.map { case (syms, c) => (mergePair(syms, best), c) }
      }
    }
    val products = merges.map { case (a, b) => a + b.stripPrefix(Cont) }
    Model((alphabet ++ products).toSet, merges.toSeq)
  }

  /** Greedy longest-match-first (the BERT WordpieceTokenizer): walk the
    * word taking the LONGEST vocabulary piece at each position
    * (continuation positions try `##`-prefixed candidates); any
    * unmatchable position collapses the whole word to `[UNK]`. */
  def encodeWord(word: String, model: Model): Array[String] = {
    if (word.isEmpty) return Array.empty
    val out = mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = math.min(word.length, start + model.maxPieceChars)
      var piece: String = null
      while (piece == null && end > start) {
        val cand =
          (if (start == 0) "" else Cont) + word.substring(start, end)
        if (model.vocab.contains(cand)) piece = cand else end -= 1
      }
      if (piece == null) return Array(Unk)
      out += piece
      start = end
    }
    out.toArray
  }

  private[corpus] def encodeText(text: UTF8String, model: Model): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val words = text.toString.split("\\s+").filter(_.nonEmpty)
    val out = mutable.ArrayBuffer.empty[Any]
    for (w <- words; t <- encodeWord(w, model)) out += UTF8String.fromString(t)
    new GenericArrayData(out.toArray)
  }

  /** Tokens column: `array<string>` of pieces under `model` (scan-stage
    * expression, vocabulary in the plan). */
  def encode(text: Column, model: Model): Column =
    Bridge.column(WordPieceEncode(Bridge.expression(text), model))

  def tokenCount(text: Column, model: Model): Column =
    size(encode(text, model))

  /** First-iteration pair scores as a DataFrame — the trainer's scoring
    * function over the whole corpus, no driver table truncation: per
    * word-INSTANCE symbol and adjacent-pair counts, then
    * score = freq / (count(left)·count(right)). The two count aggregates
    * are alphabet-sized, so the final joins broadcast.
    *
    * @param words one word per row (already pre-tokenized/cleaned)
    * @return (left_sym, right_sym, freq, score)
    */
  def pairScores(words: DataFrame, w: Column): DataFrame = {
    val ww = words.select(w.as("__w")).filter(length(col("__w")) >= 2)
    def symAt(word: Column, i: Column): Column =
      when(i === 1, word.substr(lit(1), lit(1)))
        .otherwise(concat(lit(Cont), word.substr(i, lit(1))))
    val syms = ww
      .select(explode(transform(sequence(lit(1), length(col("__w"))),
        i => symAt(col("__w"), i))).as("sym"))
      .groupBy(col("sym")).agg(count(lit(1)).as("__c"))
    val pairs = ww
      .select(explode(transform(sequence(lit(1), length(col("__w")) - 1),
        i => struct(symAt(col("__w"), i).as("l"),
          concat(lit(Cont), col("__w").substr(i + 1, lit(1))).as("r")))).as("p"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(count(lit(1)).as("freq"))
    pairs
      .join(broadcast(syms.select(col("sym").as("left_sym"), col("__c").as("__cl"))),
        Seq("left_sym"))
      .join(broadcast(syms.select(col("sym").as("right_sym"), col("__c").as("__cr"))),
        Seq("right_sym"))
      .select(col("left_sym"), col("right_sym"), col("freq"),
        (col("freq").cast("double") /
          (col("__cl") * col("__cr")).cast("double")).as("score"))
  }
}

/** Scan-stage WordPiece apply; the vocabulary rides the serialized plan.
  * Null text → empty token array (the repo's shingle convention). */
case class WordPieceEncode(child: Expression, model: WordPiece.Model)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    WordPiece.encodeText(child.eval(input).asInstanceOf[UTF8String], model)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
