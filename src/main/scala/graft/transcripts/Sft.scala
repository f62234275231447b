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

  /** Conversation-level quality gate — the transcript tier's analog of the
    * document Gopher rules: agent-training sets drop degenerate
    * conversations (too short, no assistant turns, trivial text) BEFORE
    * pair extraction. One combinable aggregate per conversation:
    * n_turns / n_assistant / n_tool / assistant_frac / mean_turn_chars /
    * span_seconds + the conjunctive `pass`.
    */
  def conversationStats(
      turns: DataFrame, minTurns: Int = 4,
      minAssistantFrac: Double = 0.2, minMeanChars: Double = 10.0): DataFrame =
    turns.groupBy(col("conv_id")).agg(
      count(lit(1)).as("n_turns"),
      sum(when(col("role") === "assistant", 1L).otherwise(0L)).as("n_assistant"),
      sum(when(col("role") === "tool", 1L).otherwise(0L)).as("n_tool"),
      avg(length(col("text")).cast("double")).as("mean_turn_chars"),
      (max(col("ts").cast("timestamp")).cast("long") -
        min(col("ts").cast("timestamp")).cast("long")).as("span_seconds"))
      .withColumn("assistant_frac",
        col("n_assistant").cast("double") / col("n_turns").cast("double"))
      .withColumn("pass",
        col("n_turns") >= minTurns &&
          col("assistant_frac") >= minAssistantFrac &&
          col("mean_turn_chars") >= minMeanChars)
}
