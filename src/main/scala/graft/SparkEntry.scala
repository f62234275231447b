package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.transcripts.Transcripts
import graft.parsers.GrokStage

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 gets a `queries` entry (Spark plan) and,
  * where SQL-expressible, an `oracleSql` entry (independent DuckDB recompute
  * over the same parquet — mostly from generator ground truth, so the Spark
  * side must genuinely parse/compute, not share code with the oracle).
  */
object SparkEntry {

  /** Flagship: full parse→enrich→route→aggregate pipeline on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.run(spark, "/root/testdata/sf0.001")

  private def transcripts(s: SparkSession, dir: String): DataFrame =
    Transcripts.load(s, dir)

  private def grokked(s: SparkSession, dir: String): DataFrame =
    GrokStage(transcripts(s, dir), "text", GrokStage.transcriptRules)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- data model: the derived transcript table itself (parity anchor)
    "q_transcripts" -> ((s, dir) => transcripts(s, dir)),

    // ---- §2.2/§2.3 compiled grok parse stage (mapPartitions, precompiled)
    "q_parse_syslog" -> ((s, dir) => {
      val p = grokked(s, dir)
      p.filter(col("rule_id") === "syslog")
        .select(
          col("conv_id"), col("turn_idx"),
          col("fields")("host").as("host"),
          col("fields")("prog").as("prog"),
          col("fields")("pid").cast("int").as("pid"),
          col("fields")("pri").cast("int").as("pri"),
          col("fields")("action").as("action"),
          col("fields")("status").as("status"))
    }),

    // parse failures are tagged, not dropped (LM_T_MSG_PARSE_ERROR semantics)
    "q_parse_errors" -> ((s, dir) => {
      val p = grokked(s, dir)
      p.filter(array_contains(col("tags"), GrokStage.ParseErrorTag))
        .select(col("conv_id"), col("turn_idx"), col("text"))
    }),

    // ---- §2.4 group-lines(): ordered per-conversation reassembly
    "q_group_lines" -> ((s, dir) => {
      transcripts(s, dir)
        .groupBy(col("conv_id"))
        .agg(
          count(lit(1)).as("n_turns"),
          concat_ws("\n",
            transform(
              array_sort(collect_list(struct(col("turn_idx"), col("text")))),
              x => x("text"))).as("joined"))
    }),

    // ---- hash aggregate baseline (lineitem)
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_transcripts" -> Transcripts.oracle(
      "SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts"),

    "q_parse_syslog" -> Transcripts.oracle(
      """SELECT conv_id, turn_idx,
           concat('host-', cast(hostnum AS varchar)) AS host,
           concat('prog-', cast(prognum AS varchar)) AS prog,
           pid, pri, action, status
         FROM transcripts_full WHERE variant = 0"""),

    "q_parse_errors" -> Transcripts.oracle(
      "SELECT conv_id, turn_idx, text FROM transcripts_full WHERE variant = 4"),

    "q_group_lines" -> Transcripts.oracle(
      """SELECT conv_id, count(*) AS n_turns,
           string_agg(text, chr(10) ORDER BY turn_idx) AS joined
         FROM transcripts GROUP BY conv_id"""),

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY 1, 2"""
  )
}
