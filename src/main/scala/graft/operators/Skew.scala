package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot conversation ids (north rule: a 10^12-turn corpus
  * has conversations orders of magnitude longer than the median — one
  * reducer must never own a whole hot key).
  *
  * Two mechanisms, used together:
  *
  *  1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`) for
  *     joins — runtime re-planning, nothing to do in the plan.
  *  2. Salted two-phase aggregation for hash aggregates whose combine step
  *     is associative: phase 1 groups by (key, salt) — the hot key's rows
  *     spread over `salts` reducers — phase 2 merges the partials by key.
  */
object Skew {

  /** Deterministic salt ∈ [0, salts): hash of stable discriminator columns
    * (NOT rand() — re-execution of a failed stage must re-derive the same
    * salt or shuffle retries double-count rows).
    */
  def salt(salts: Int, discriminators: Column*): Column =
    pmod(hash(discriminators: _*), lit(salts))

  /** Salted count per key: phase-1 count by (key, salt), phase-2 sum by
    * key. Result identical to `groupBy(key).count()`; the hot key's work is
    * spread over `salts` tasks.
    */
  def saltedCount(df: DataFrame, key: Column, saltCol: Column): DataFrame =
    df.groupBy(key.as("key"), saltCol.as("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("n"))

  /** Salted group-lines (SURVEY §2.4): ordered per-conversation text
    * reassembly that survives hot conversations. Phase 1 builds ordered
    * partial joins per (conv, salt-range); phase 2 concatenates the
    * partials in salt-range order. The salt here MUST be order-aligned
    * (a contiguous turn_idx range), not a hash — concatenation of partials
    * is only correct if each partial covers a contiguous slice of the
    * order.
    *
    * Result is row-identical to the unsalted
    * `groupBy(conv).agg(concat_ws over sorted collect_list)`.
    */
  def saltedGroupLines(
      df: DataFrame,
      conv: Column,
      turnIdx: Column,
      text: Column,
      sliceSize: Int = 1000): DataFrame = {
    val slice = floor(turnIdx / sliceSize)
    df.groupBy(conv.as("conv_id"), slice.as("slice"))
      .agg(
        count(lit(1)).as("n_part"),
        concat_ws("\n",
          transform(array_sort(collect_list(struct(turnIdx.as("i"), text.as("t")))),
            x => x("t"))).as("joined_part"))
      .groupBy(col("conv_id"))
      .agg(
        sum(col("n_part")).as("n_turns"),
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("slice"), col("joined_part")))),
            x => x("joined_part"))).as("joined"))
  }
}
