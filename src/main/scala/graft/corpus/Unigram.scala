package graft.corpus

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram language-model tokenizer (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece `--model_type=unigram` algorithm), the second half of the
  * tokenizer tier next to [[Bpe]]: instead of greedy merges, a vocabulary
  * of pieces with probabilities is fit by EM and text is segmented by
  * Viterbi into the maximum-likelihood piece sequence.
  *
  * Split of labor at scale — identical to [[Bpe.train]]'s contract:
  *  - the DISTRIBUTED half is one word-count aggregate (explode →
  *    combinable count); EM/pruning run on the DRIVER over the top
  *    `maxVocabWords` word types (the word-frequency table is how the
  *    reference implementations train too — the corpus itself is never
  *    re-read per iteration);
  *  - [[encode]] / [[encodeIds]] are scan-stage expressions carrying the
  *    piece table in the plan — per word a Viterbi DP over substring
  *    matches, no shuffle, no UDF registry.
  *
  * Training loop (the standard construction):
  *  1. seed = all substrings of the word table up to `maxPieceLen` chars,
  *     scored by occurrence mass, truncated to `seedSize` — single
  *     characters are ALWAYS kept so every word stays segmentable;
  *  2. EM: forward–backward over each word's segmentation lattice gives
  *     expected piece counts under current probabilities; M-step
  *     re-normalizes (each iteration provably does not decrease the
  *     corpus likelihood — pinned by the spec);
  *  3. prune: drop the lowest-expected-count multi-char pieces (ties by
  *     piece string — deterministic) down to `shrinkFactor` of the
  *     current size, re-run EM, repeat until `vocabSize`. Pruning by
  *     expected count is the documented simplification of SentencePiece's
  *     exact leave-one-out likelihood loss (same substitution precedent
  *     as add-α for KenLM in [[LanguageModel]]).
  *
  * Everything driver-side iterates in SORTED piece order — no HashMap
  * iteration-order nondeterminism reaches the result; retrains on the
  * same corpus are bit-identical.
  *
  * Apply-time coverage: a character outside the vocabulary segments as a
  * single-char piece at [[Unigram.UnkLogProb]] (SentencePiece's unk
  * penalty); [[encodeIds]] maps such pieces to id 0 (`<unk>`).
  */
object Unigram {

  /** Fixed log-prob for out-of-vocabulary single characters at apply time
    * (low enough that any in-vocabulary segmentation wins). */
  val UnkLogProb: Double = -30.0

  /** A trained model: piece → log probability. */
  final case class Model(logProbs: Map[String, Double], maxPieceLen: Int)

  /** Distributed word-count table (count desc, word asc, top `max`). */
  private def wordTable(corpus: DataFrame, text: Column, max: Int): Array[(String, Long)] =
    corpus.select(explode(split(text, "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(max)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** Expected piece counts + total corpus log-likelihood under `logP`
    * via forward–backward over each word's segmentation lattice. */
  private[graft] def eStep(
      words: Array[(String, Long)], logP: collection.Map[String, Double],
      maxPieceLen: Int): (mutable.HashMap[String, Double], Double) = {
    val counts = mutable.HashMap.empty[String, Double]
    var loglik = 0.0
    def lse(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }
    for ((w, c) <- words) {
      val n = w.length
      val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
      val beta = Array.fill(n + 1)(Double.NegativeInfinity)
      alpha(0) = 0.0; beta(n) = 0.0
      var j = 1
      while (j <= n) {
        var i = math.max(0, j - maxPieceLen)
        while (i < j) {
          logP.get(w.substring(i, j)).foreach { lp =>
            alpha(j) = lse(alpha(j), alpha(i) + lp)
          }
          i += 1
        }
        j += 1
      }
      var i2 = n - 1
      while (i2 >= 0) {
        var k = math.min(n, i2 + maxPieceLen)
        while (k > i2) {
          logP.get(w.substring(i2, k)).foreach { lp =>
            beta(i2) = lse(beta(i2), lp + beta(k))
          }
          k -= 1
        }
        i2 -= 1
      }
      val z = alpha(n)
      if (z != Double.NegativeInfinity) {
        loglik += c * z
        var s = 0
        while (s < n) {
          var e = s + 1
          val eMax = math.min(n, s + maxPieceLen)
          while (e <= eMax) {
            val piece = w.substring(s, e)
            logP.get(piece).foreach { lp =>
              val post = alpha(s) + lp + beta(e) - z
              if (post > -700.0) { // exp underflow guard
                counts.update(piece, counts.getOrElse(piece, 0.0) + c * math.exp(post))
              }
            }
            e += 1
          }
          s += 1
        }
      }
      // unsegmentable words (all pieces pruned — cannot happen while
      // single chars are kept) contribute nothing
    }
    (counts, loglik)
  }

  /** M-step: normalize expected counts to log probabilities (sorted
    * iteration — deterministic float accumulation). */
  private def mStep(counts: mutable.HashMap[String, Double]): Map[String, Double] = {
    val sorted = counts.toSeq.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    sorted.iterator.map { case (p, c) =>
      p -> (if (c > 0.0) math.log(c / total) else Double.NegativeInfinity)
    }.toMap
  }

  /** One EM step over a word table: expected counts under the model,
    * re-normalized (single chars held at epsilon so coverage survives). */
  private[graft] def emOnce(
      words: Array[(String, Long)], model: Model):
      (Model, mutable.HashMap[String, Double]) = {
    val (counts, _) = eStep(words, model.logProbs, model.maxPieceLen)
    for (p <- model.logProbs.keys if p.length == 1 && !counts.contains(p))
      counts.update(p, 1e-10)
    (Model(mStep(counts), model.maxPieceLen), counts)
  }

  /** Train a unigram model. `vocabSize` counts pieces only (the reserved
    * `<unk>` id lives in [[vocab]], not the model). */
  def train(
      corpus: DataFrame, text: Column, vocabSize: Int,
      maxPieceLen: Int = 8, seedSize: Int = 100000,
      maxVocabWords: Int = 50000, emIters: Int = 2,
      shrinkFactor: Double = 0.75): Model = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && emIters >= 1)
    require(shrinkFactor > 0.0 && shrinkFactor < 1.0)
    val words = wordTable(corpus, text, maxVocabWords)

    // seed: substring occurrence mass, single chars always kept
    val seedCounts = mutable.HashMap.empty[String, Double]
    for ((w, c) <- words) {
      var i = 0
      while (i < w.length) {
        var j = i + 1
        val jMax = math.min(w.length, i + maxPieceLen)
        while (j <= jMax) {
          val p = w.substring(i, j)
          seedCounts.update(p, seedCounts.getOrElse(p, 0.0) + c.toDouble)
          j += 1
        }
        i += 1
      }
    }
    val (chars, multi) = seedCounts.toSeq.partition(_._1.length == 1)
    val seed = (chars ++ multi.sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedSize - chars.length))).sortBy(_._1)
    val total0 = seed.iterator.map(_._2).sum
    var logP: Map[String, Double] =
      seed.map { case (p, c) => p -> math.log(c / total0) }.toMap

    // EM + prune until the piece budget
    var done = false
    while (!done) {
      var it = 0
      var lastCounts: mutable.HashMap[String, Double] = null
      while (it < emIters) {
        val (m, counts) = emOnce(words, Model(logP, maxPieceLen))
        logP = m.logProbs
        lastCounts = counts
        it += 1
      }
      val nMulti = logP.count(_._1.length > 1)
      val nChars = logP.size - nMulti
      if (logP.size <= math.max(vocabSize, nChars)) done = true
      else {
        val target = math.max(vocabSize - nChars,
          (nMulti * shrinkFactor).toInt) // shrink gradually, never below budget
        val keep = logP.keysIterator.filter(_.length > 1).toSeq
          .sortBy(p => (-lastCounts.getOrElse(p, 0.0), p))
          .take(math.max(target, 0)).toSet
        logP = logP.filter { case (p, _) => p.length == 1 || keep(p) }
        if (nMulti == keep.size) done = true // nothing pruned → stable
      }
    }
    Model(logP, maxPieceLen)
  }

  /** Viterbi segmentation of one word: maximum-likelihood piece sequence;
    * OOV characters fall back to single-char pieces at [[UnkLogProb]].
    * Deterministic tie-break: the LONGER piece ending at a position wins
    * equal scores (checked i ascending, later i = shorter piece replaces
    * only on strict improvement). */
  def encodeWord(word: String, model: Model): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - model.maxPieceLen)
      while (i < j) {
        val lp =
          if (j - i == 1) model.logProbs.getOrElse(word.substring(i, j), UnkLogProb)
          else model.logProbs.getOrElse(word.substring(i, j), Double.NegativeInfinity)
        if (lp != Double.NegativeInfinity && best(i) + lp > best(j)) {
          best(j) = best(i) + lp
          back(j) = i
        }
        i += 1
      }
      j += 1
    }
    val out = mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { out += word.substring(back(k), k); k = back(k) }
    out.reverseIterator.toArray
  }

  private[graft] def encodeText(text: UTF8String, model: Model): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val words = text.toString.split("\\s+").filter(_.nonEmpty)
    val out = mutable.ArrayBuffer.empty[Any]
    for (w <- words; p <- encodeWord(w, model)) out += UTF8String.fromString(p)
    new GenericArrayData(out.toArray)
  }

  /** Tokens column: `array<string>` of unigram pieces. */
  def encode(text: Column, model: Model): Column =
    Bridge.column(UnigramEncode(Bridge.expression(text), model))

  def tokenCount(text: Column, model: Model): Column =
    size(encode(text, model))

  /** Piece → id: `<unk>` = 0, then pieces in (logprob desc, piece asc)
    * order — frequent pieces get small ids, deterministically. */
  def vocab(model: Model): Map[String, Int] = {
    val ordered = model.logProbs.toSeq.sortBy { case (p, lp) => (-lp, p) }
    (("<unk>", 0) +: ordered.zipWithIndex.map { case ((p, _), i) => (p, i + 1) }).toMap
  }

  /** Token-id column: `array<int>`; OOV fallback pieces map to 0. */
  def encodeIds(text: Column, model: Model, vocab: Map[String, Int]): Column =
    Bridge.column(UnigramEncodeIds(Bridge.expression(text), model, vocab))

  /** Corpus log-likelihood of a word table under a model — the EM
    * monotonicity witness the spec pins. */
  private[graft] def likelihood(
      words: Array[(String, Long)], model: Model): Double =
    eStep(words, model.logProbs, model.maxPieceLen)._2

  private[graft] def wordTableOf(corpus: DataFrame, text: Column,
      max: Int = 50000): Array[(String, Long)] = wordTable(corpus, text, max)
}

/** Scan-stage unigram Viterbi apply; the piece table rides the plan. */
case class UnigramEncode(child: Expression, model: Unigram.Model)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    Unigram.encodeText(child.eval(input).asInstanceOf[UTF8String], model)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unigram apply + id lookup; OOV pieces → 0. */
case class UnigramEncodeIds(
    child: Expression, model: Unigram.Model, vocab: Map[String, Int])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val t = child.eval(input).asInstanceOf[UTF8String]
    if (t == null) return new GenericArrayData(Array.empty[Any])
    val words = t.toString.split("\\s+").filter(_.nonEmpty)
    val out = mutable.ArrayBuffer.empty[Any]
    for (w <- words; p <- Unigram.encodeWord(w, model))
      out += Integer.valueOf(vocab.getOrElse(p, 0))
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
