package graft

import org.apache.spark.sql.functions._

import graft.corpus.{Dedup, Multimodal, Similarity, TextStats}

/** Training-data corpus operators: dedup family, similarity search, text
  * stats, multimodal plumbing.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"$sfUnit/documents.parquet").cache()
  private lazy val embs =
    spark.read.parquet(s"$sfUnit/embeddings.parquet").cache()

  test("shingles: k-grams, distinct, short-doc guard") {
    val d = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x x x x x")).toDF("doc_id", "text")
    val got = d.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L).sorted === Seq("a b c", "b c d"))
    assert(got(2L) === Seq.empty) // fewer than k words
    assert(got(3L) === Seq("x x x")) // distinct
  }

  test("exact dedup groups identical normalized text") {
    val d = Seq((1L, "Hello World"), (2L, "hello world  "), (3L, "other"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(d, col("doc_id"), col("text"))
      .select("keep_id", "n_copies").as[(Long, Long)].collect().sorted
    assert(got === Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash-LSH pairs == exact n-gram jaccard pairs on the corpus (full recall)") {
    val lsh = Dedup.minhashLsh(docs, col("doc_id"), col("text"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh === exact)
    assert(exact.nonEmpty) // the corpus plants near-dup pairs
  }

  test("simhash: near-dup pairs have closer hamming than random pairs") {
    val sig = Dedup.simhash(docs, col("doc_id"), col("text"))
    assert(sig.count() === docs.count())
    val pairs = Dedup.simhashPairs(docs, col("doc_id"), col("text"))
      .select("hamming").as[Int].collect()
    assert(pairs.forall(_ <= 3))
  }

  test("cosine top-k: ranks are 1..k per query, best neighbor is a planted near-dup or self-cluster") {
    val got = Similarity.cosineTopK(
      embs, col("vec_id"), col("embedding"),
      embs.filter(col("vec_id") < 3), col("vec_id"), col("embedding"), k = 4)
      .as[(Long, Int, Long, Double)].collect()
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet === Set(0L, 1L, 2L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_._2).sorted === Seq(1, 2, 3, 4))
      val scores = rows.sortBy(_._2).map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }) // descending
      assert(rows.forall(r => r._3 != r._1)) // self excluded
    }
  }

  test("IVF top-k ⊆ same-cluster brute force; scores match brute force on same-label hits") {
    val ivf = Similarity.ivfTopK(
      embs, col("vec_id"), col("embedding"), col("label"),
      embs.filter(col("vec_id") < 3), col("vec_id"), col("embedding"), col("label"), k = 2)
      .as[(Long, Int, Long, Double)].collect()
    val labels = embs.select("vec_id", "label").as[(Long, Int)].collect().toMap
    ivf.foreach { case (q, _, n, _) => assert(labels(q) === labels(n)) }
  }

  test("text stats: ranges and determinism") {
    val got = docs.select(col("doc_id"),
      TextStats.wsTokenCount(col("text")).as("n"),
      TextStats.bpeTokenEstimate(col("text")).as("b"),
      TextStats.stopwordRatio(col("text")).as("sr"),
      TextStats.qualityScore(col("text")).as("q"),
      TextStats.isEnglish(col("text")).as("e"))
      .as[(Long, Int, Int, Double, Double, Boolean)].collect()
    assert(got.forall(r => r._2 > 0 && r._3 >= r._2 * 0)) // sane counts
    assert(got.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    assert(got.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
    // fingerprint: equal for identical text, 32-hex shaped
    val fps = docs.select(TextStats.fingerprint(col("text"))).as[String].collect()
    assert(fps.forall(_.matches("[0-9a-f]{32}")))
  }

  test("multimodal: payload → per-partition stub decode → meta struct + features") {
    val d = Multimodal.decode(Multimodal.withPayload(docs, "text"))
    assert(d.schema("meta").dataType === Multimodal.MetaSchema)
    val m = d.select(col("meta.n_bytes"), length(col("text")).cast("long")).as[(Long, Long)].collect()
    assert(m.forall { case (n, l) => n === l }) // ascii text: bytes == chars
    val f = Multimodal.features(Multimodal.withPayload(docs, "text"), dim = 8)
    val v = f.select("features").as[Seq[Float]].head()
    assert(v.length === 8 && v.forall(x => x >= 0f && x < 1f))
  }
}
