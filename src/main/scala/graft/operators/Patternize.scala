package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's log-pattern miner — `patternize` / SLCT clustering
  * (modules/correlation/patternize.c ptz_find_frequent_words:100 +
  * ptz_find_clusters_slct:234, validated against tests/test_patternize.c):
  * discover message templates by replacing infrequent word positions with a
  * wildcard.
  *
  *  1. frequent (position, word) pairs: occurrence count ≥ `support`
  *  2. per message: the pattern keeps a word where (pos, word) is frequent
  *     and wildcards (`@`) the position otherwise; a message is a candidate
  *     when ≥1 of its words is frequent
  *  3. clusters = candidate patterns with ≥ `support` member messages
  *
  * (The reference's two-pass hashed pre-filter is a single-node memory
  * optimization — the Spark shape is already one combinable hash aggregate.
  * Its per-message delimiter-sequence key suffix exists to disambiguate
  * multi-delimiter splits; with one split regex, positional reassembly
  * carries the same information.)
  *
  * Scale shape: posexplode → hash-aggregate (map-side combinable) →
  * shuffle join exploded-words⇄frequent-set on (pos, word) → per-message
  * sort-agg → pattern hash-aggregate. No driver collects, no cross joins;
  * the frequent set is vocabulary-bounded, so AQE usually broadcasts it.
  * Everything is content-derived — retries and the oracle reproduce the
  * identical clustering.
  */
object Patternize {

  /** (pos, word, freq) pairs with freq ≥ support. */
  def frequentWords(df: DataFrame, text: Column, support: Long,
      delimiters: String = " "): DataFrame =
    df.select(posexplode(split(text, delimiters)).as(Seq("pos", "word")))
      .groupBy("pos", "word").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= support)

  /** Per-message pattern assignment: (id, pattern, is_candidate). */
  def assign(df: DataFrame, id: Column, text: Column, support: Long,
      delimiters: String = " "): DataFrame = {
    val words = df.select(id.as("__pid"),
      posexplode(split(text, delimiters)).as(Seq("pos", "word")))
    val freq = frequentWords(df, text, support, delimiters)
      .select(col("pos"), col("word"), lit(true).as("__freq"))
    words.join(freq, Seq("pos", "word"), "left")
      .groupBy(col("__pid"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"),
            coalesce(when(col("__freq"), col("word")), lit("@")).as("tok")))),
          x => x("tok"))).as("pattern"),
        coalesce(max(col("__freq")), lit(false)).as("is_candidate"))
      .withColumnRenamed("__pid", "member_id")
  }

  /** The discovered clusters: (pattern, n_msgs) with n_msgs ≥ support. */
  def clusters(df: DataFrame, id: Column, text: Column, support: Long,
      delimiters: String = " "): DataFrame =
    assign(df, id, text, support, delimiters)
      .filter(col("is_candidate"))
      .groupBy("pattern").agg(count(lit(1)).as("n_msgs"))
      .filter(col("n_msgs") >= support)
}
