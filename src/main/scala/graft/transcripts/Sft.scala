package graft.transcripts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transcript → SFT-sample conversion — where the log/transcript tier
  * meets the training-data tier: every `targetRole` turn becomes one
  * (context, target) supervised pair, the context being the prior turns
  * of the SAME conversation rendered `role: text` and joined by newlines,
  * in stable (conv_id, turn_idx) order (the north rule's ordering
  * invariant is exactly what makes the context deterministic).
  *
  * Scale shape: one running-window per conversation (the same
  * partitioning every sessionize/grouping-by op here uses; conversations
  * are bounded, so the window frame is bounded). Materialized contexts
  * duplicate prior text across samples by design — that is what SFT
  * training files look like; cap the blowup with `maxContextTurns` and
  * hand the output to [[graft.corpus.Sampling.packByBudget]] downstream.
  */
object Sft {

  /** One row per `targetRole` turn: (conv_id, turn_idx, context, target,
    * n_context_turns). `maxContextTurns` keeps only the most recent k
    * prior turns (0 = none, negative = unlimited). */
  def pairs(
      turns: DataFrame, targetRole: String = "assistant",
      maxContextTurns: Int = -1): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ctx = collect_list(concat_ws(": ", col("role"), col("text"))).over(w)
    val clipped =
      if (maxContextTurns < 0) col("__ctx")
      else slice(col("__ctx"),
        greatest(size(col("__ctx")) - maxContextTurns + 1, lit(1)),
        lit(maxContextTurns))
    turns
      .withColumn("__ctx", ctx)
      .filter(col("role") === targetRole)
      .select(col("conv_id"), col("turn_idx"),
        concat_ws("\n", clipped).as("context"),
        col("text").as("target"),
        size(clipped).cast("long").as("n_context_turns")) // turns IN the emitted context
  }
}
