package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality classifier over hashed n-gram features — the
  * fasttext-shaped model behind the "model-based quality filter" stage of
  * modern curation pipelines (DCLM / FineWeb-Edu style: score every
  * document with a cheap linear text classifier trained on labeled seeds,
  * keep the high-scoring band). Features are the SAME hashed word
  * uni+bigram buckets as [[Dsir.hashedBuckets]] (one feature extractor,
  * two consumers); a document's representation is the MEAN of its bucket
  * one-hots (fasttext's averaged bag), so
  * score(doc) = σ(bias + Σ w[bucket]/n_feats).
  *
  * Training is batch logistic regression by full-batch gradient descent:
  * each iteration is ONE distributed pass — per-doc margins from a
  * broadcast weight array, per-bucket gradients from an id-keyed join of
  * the (doc, bucket) posting frame with the doc-level error — and the
  * B-sized gradient collects to the driver (`buckets` doubles, the model
  * IS driver-sized by construction, like the IVF centroids). Labeled
  * training sets are seed-sized (10³–10⁶ docs); the 100 TB-scale step is
  * [[score]], a pure scan-stage expression carrying the weights as an
  * array literal — zero shuffles, zero joins at apply time.
  *
  * Deterministic: zero-initialized weights, no sampling, no rand();
  * per-bucket float sums may differ by ulps across partition merge orders
  * (documented — same class of divergence as the DSIR/perplexity sums).
  */
object Classifier {

  final case class Model(weights: Array[Double], bias: Double, buckets: Int)

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Mean-bucket margin + sigmoid under a weight array literal. Docs with
    * no features score σ(bias). */
  def score(text: Column, model: Model): Column = {
    require(model.weights.length == model.buckets,
      s"weights length ${model.weights.length} != buckets ${model.buckets}")
    val w = typedlit(model.weights.toSeq)
    val f = Dsir.hashedBuckets(text, model.buckets)
    val mean = when(size(f) > 0,
      aggregate(f, lit(0.0),
        (acc, b) => acc + element_at(w, b.cast("int") + 1)) / size(f).cast("double"))
      .otherwise(lit(0.0))
    sigmoid(mean + lit(model.bias))
  }

  /** Train by full-batch gradient descent: `iters` distributed passes.
    * `label` ∈ {0, 1}. */
  def train(
      docs: DataFrame, id: Column, text: Column, label: Column,
      buckets: Int = 4096, iters: Int = 30, lr: Double = 2.0): Model = {
    require(iters >= 0 && buckets >= 2)
    val feats = docs
      .select(id.as("__id"), label.cast("double").as("y"),
        Dsir.hashedBuckets(text, buckets).as("fs"))
      .filter(size(col("fs")) > 0) // no features = no evidence (dsir rule)
      .select(col("__id"), col("y"), size(col("fs")).cast("double").as("n"),
        explode(col("fs")).as("bucket"))
      .persist()
    feats.count() // materialize once; every iteration reuses the cache
    val nDocs = math.max(1L, feats.select(col("__id")).distinct().count())
    val w = new Array[Double](buckets)
    var bias = 0.0
    try {
      var it = 0
      while (it < iters) {
        val wl = typedlit(w.toSeq)
        val perDoc = feats
          .groupBy(col("__id"), col("y"), col("n"))
          .agg(sum(element_at(wl, col("bucket").cast("int") + 1)).as("__s"))
          .select(col("__id"),
            (sigmoid(col("__s") / col("n") + lit(bias)) - col("y")).as("err"))
        // per-bucket gradient: err_i · x_ij = err_i / n_i summed over the
        // occurrence rows holding the bucket (id-keyed join back onto the
        // posting frame). The bias gradient Σ err_i needs no second pass:
        // each doc spreads err_i/n_i over its n_i occurrence rows, so the
        // bucket gradients SUM to it.
        val grad = feats.join(perDoc, Seq("__id"))
          .groupBy(col("bucket"))
          .agg(sum(col("err") / col("n")).as("g"))
          .collect()
        val biasGrad = grad.map(_.getAs[Double]("g")).sum
        grad.foreach { r =>
          val b = r.getAs[Long]("bucket").toInt
          w(b) -= lr * r.getAs[Double]("g") / nDocs
        }
        bias -= lr * biasGrad / nDocs
        it += 1
      }
      Model(w, bias, buckets)
    } finally { feats.unpersist(); () }
  }
}
