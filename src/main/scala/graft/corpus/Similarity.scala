package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k with the (small) query set broadcast —
  * one scan of the corpus, no shuffle of the corpus side, a per-query top-k
  * window at the end. Scale path: IVF — a coarse quantizer assigns every
  * vector to a cluster; queries probe only their cluster's bucket, turning
  * the scan into a hash-join on cluster id. Both paths share the same
  * codegen'd dot-product expression (higher-order functions — no UDF).
  */
object Similarity {

  /** Sequential-fold dot product in double precision: `zip_with` then
    * `aggregate` — deterministic left-to-right summation (stable across
    * engines and runs, unlike a shuffled SUM).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every query vector against the whole corpus.
    * `queries` must be broadcast-sized (it is hinted); the corpus side
    * streams. Deterministic tie-break on corpus id.
    * Returns (query_id, rank, neighbor_id, score).
    */
  def cosineTopK(
      corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("cv"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
    val scored = c.crossJoin(broadcast(q)) // corpus side streams, queries broadcast
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
    topK(scored, k)
  }

  /** IVF probe: vectors are pre-assigned to coarse clusters (`clusterCol` —
    * in production the argmin-centroid assignment, here the corpus's
    * clustering column); each query searches only its own cluster's
    * inverted list. One hash join on cluster id replaces the full scan.
    */
  def ivfTopK(
      corpus: DataFrame, corpusId: Column, corpusVec: Column, corpusCluster: Column,
      queries: DataFrame, queryId: Column, queryVec: Column, queryCluster: Column,
      k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("cv"),
      corpusCluster.as("cluster"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"),
      queryCluster.as("cluster"))
    val scored = c.join(broadcast(q), Seq("cluster"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
    topK(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a, b) with cosine ≥
    * threshold. Exact small-corpus baseline is the broadcast self-join
    * below; the 100 TB path blocks candidates first (IVF cluster ids or
    * random-hyperplane LSH — same shape as Dedup.minhashLsh) and verifies
    * with this same cosine, trading recall at the threshold boundary for
    * a bounded candidate join.
    */
  def cosineNearDupPairs(
      corpus: DataFrame, id: Column, vec: Column, threshold: Double): DataFrame = {
    val a = corpus.select(id.as("vec_a"), vec.as("va"))
    val b = corpus.select(id.as("vec_b"), vec.as("vb"))
    a.crossJoin(broadcast(b))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }
}
