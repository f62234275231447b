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

  /** SFT sequence assembly with loss-mask spans — the step after pair/
    * conversation extraction that training actually consumes: ONE row per
    * conversation holding the full rendered sequence (`role: text` turns
    * joined by newlines, stable turn order) plus the char-offset spans
    * `[start:end)` of every `lossRole` turn's TEXT (the `role: ` prefix
    * and all other roles are masked out — loss lands only on what the
    * assistant said, the standard SFT masking rule).
    *
    * Output: conv_id, text, mask_spans (`start:end` joined by `,`, empty
    * when the conversation has no `lossRole` turn), n_loss_chars,
    * n_turns.
    *
    * Scale shape: one cumulative-length window per conversation followed
    * by one group-by on the SAME key — the planner reuses the window's
    * hash partitioning, so the whole assembly is a single shuffle, and
    * every frame/group is bounded by the conversation length.
    */
  def lossMaskedSequence(
      turns: DataFrame, lossRole: String = "assistant"): DataFrame = {
    val wPrior = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOff = turns
      .withColumn("__seg", concat_ws(": ", col("role"), col("text")))
      // chars before this turn's segment: prior segments + their '\n's
      .withColumn("__off",
        coalesce(sum(length(col("__seg")).cast("long") + 1L).over(wPrior),
          lit(0L)))
    val span = struct(col("turn_idx"),
      (col("__off") + length(col("role")).cast("long") + 2L).as("s"),
      (col("__off") + length(col("__seg")).cast("long")).as("e"))
    withOff.groupBy(col("conv_id")).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("turn_idx"), col("__seg").as("seg")))),
        x => x.getField("seg")), "\n").as("text"),
      array_join(transform(
        array_sort(collect_list(when(col("role") === lossRole, span))),
        x => concat(x.getField("s").cast("string"), lit(":"),
          x.getField("e").cast("string"))), ",").as("mask_spans"),
      sum(when(col("role") === lossRole, length(col("text")).cast("long"))
        .otherwise(0L)).as("n_loss_chars"),
      count(lit(1)).as("n_turns"))
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
