package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus down-sampling + vocabulary for training-data curation — the
  * operations that sit next to dedup in a real pipeline (balance languages
  * and sources, inspect the token distribution).
  *
  * Sampling is DETERMINISTIC, not `rand()`-based: a row is kept iff the
  * first 8 md5 hex digits of its key fall below the stratum's threshold.
  * Stage retries, resumed jobs and the DuckDB oracle all reproduce the
  * identical sample (the repo's determinism rule — content-derived
  * decisions only), and the per-row decision runs in the scan stage with
  * zero shuffles. Lexicographic comparison of fixed-width lowercase hex is
  * order-isomorphic to the numeric value, so the same predicate is
  * expressible in any engine with md5().
  */
object Sampling {

  /** The threshold under which a uniform md5-prefix draw keeps a row with
    * probability `fraction`. Fraction ≥ 1.0 returns "g" — lexicographically
    * above every hex prefix, so keep-all really keeps ALL rows (a strict
    * `< "ffffffff"` would drop the 1-in-2^32 prefix-ffffffff rows, which
    * exist at the target corpus scale).
    */
  def thresholdHex(fraction: Double): String =
    if (fraction >= 1.0) "g"
    else {
      val t = math.max(fraction, 0.0)
      f"${(t * 4294967296.0).toLong}%08x"
    }

  /** Uniform deterministic sample: keep ≈`fraction` of rows, decided by
    * md5(key). Scan-stage predicate, no shuffle, no state.
    */
  def sample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(substring(md5(key.cast("string")), 1, 8) < lit(thresholdHex(fraction)))

  /** Stratified deterministic sample: per-stratum keep fractions, e.g.
    * down-weight over-represented languages
    * (`Map("en" -> 0.25, "de" -> 1.0)`). Strata absent from the map keep
    * `defaultFraction`. One scan-stage CASE over the stratum column —
    * at 100 TB this is a filter pushed into the parquet scan, not a
    * `sampleBy` driver round-trip.
    */
  def sampleStratified(
      df: DataFrame, key: Column, stratum: Column,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0): DataFrame = {
    val threshold = fractions.foldLeft(lit(thresholdHex(defaultFraction))) {
      case (acc, (s, f)) => when(stratum === s, lit(thresholdHex(f))).otherwise(acc)
    }
    df.filter(substring(md5(key.cast("string")), 1, 8) < threshold)
  }

  /** Corpus vocabulary: the `k` most frequent whitespace tokens with
    * deterministic ties (count desc, token asc). One explode + one
    * map-side-combinable hash aggregate + a k-row ordered take — the
    * standard word-count shape that survives any corpus size.
    */
  def vocabulary(df: DataFrame, text: Column, k: Int): DataFrame =
    df.select(explode(split(text, " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)
}
