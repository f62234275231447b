package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.enrich.ContextualData
import graft.filters.Filters
import graft.functions.GraftFunctions
import graft.model.SyslogNames
import graft.parsers.{FieldParsers, GrokStage}
import graft.rewrite.Rewrites
import graft.transcripts.Transcripts

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 gets a `queries` entry (Spark plan) and,
  * where SQL-expressible, an `oracleSql` entry. Oracles are independent
  * DuckDB recomputes — mostly from the generator's ground-truth columns
  * (`transcripts_full`), so the Spark side must genuinely parse/route/compute
  * and cannot share logic with the oracle.
  */
object SparkEntry {

  /** Flagship: full parse→enrich→route→aggregate pipeline on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.run(spark, "/root/testdata/sf0.001")

  private def transcripts(s: SparkSession, dir: String): DataFrame =
    Transcripts.load(s, dir)

  private def grokked(s: SparkSession, dir: String): DataFrame =
    GrokStage(transcripts(s, dir), "text", GrokStage.transcriptRules)

  private def f(key: String): Column = col("fields")(key)

  // ---- shared oracle fragments (route ground truth, DuckDB dialect) ------
  private val R_TOOL = "(variant = 1 AND tool IS NOT NULL)"
  private val R_ERR_RAW =
    "((variant IN (0,2) AND status IN ('error','fail')) OR (variant = 1 AND okflag = 'false'))"
  private val R_ERR = s"($R_ERR_RAW AND NOT $R_TOOL)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ================= data model =================
    "q_transcripts" -> ((s, dir) => transcripts(s, dir)),

    // ================= §2.2/§2.3 parse stage =================
    "q_parse_syslog" -> ((s, dir) => {
      grokked(s, dir).filter(col("rule_id") === "syslog")
        .select(col("conv_id"), col("turn_idx"),
          f("host").as("host"), f("prog").as("prog"),
          f("pid").cast("int").as("pid"), f("pri").cast("int").as("pri"),
          f("action").as("action"), f("status").as("status"))
    }),

    "q_parse_errors" -> ((s, dir) => {
      grokked(s, dir).filter(array_contains(col("tags"), GrokStage.ParseErrorTag))
        .select(col("conv_id"), col("turn_idx"), col("text"))
    }),

    "q_parse_kv" -> ((s, dir) => {
      val t = transcripts(s, dir).filter(col("text").startsWith("event="))
      t.withColumn("m", FieldParsers.kvParser(col("text")))
        .select(col("conv_id"), col("turn_idx"),
          col("m")("event").as("event"), col("m")("tool").as("tool_field"),
          col("m")("duration_ms").cast("int").as("duration_ms"),
          col("m")("ok").as("ok"))
    }),

    "q_parse_json" -> ((s, dir) => {
      val t = transcripts(s, dir).filter(col("text").startsWith("{"))
      t.withColumn("j",
          FieldParsers.jsonParser(col("text"), "event STRING, role STRING, tokens INT, status STRING"))
        .select(col("conv_id"), col("turn_idx"),
          col("j")("event").as("event"), col("j")("role").as("role_j"),
          col("j")("tokens").as("tokens"), col("j")("status").as("status"))
    }),

    "q_parse_csv" -> ((s, dir) => {
      val t = transcripts(s, dir).filter(col("text").rlike("^conv-\\d+,"))
      FieldParsers.csvParser(t, col("text"), Seq("c_conv", "c_turn", "c_role", "latency"))
        .select(col("conv_id"), col("turn_idx"), col("c_conv"),
          col("c_turn").cast("int").as("c_turn"), col("c_role"),
          col("latency").cast("int").as("latency_ms"))
    }),

    "q_parse_date" -> ((s, dir) => {
      grokked(s, dir).filter(col("rule_id") === "syslog")
        .select(col("conv_id"), col("turn_idx"),
          FieldParsers.syslogTimestamp(f("mon"), f("dd"), f("hh"), f("mi"), f("ss"), 2026)
            .cast("timestamp_ntz").as("event_ts"))
    }),

    // ================= §2.5 filters =================
    "q_filter_pri" -> ((s, dir) => {
      val p = grokked(s, dir).filter(col("rule_id") === "syslog")
        .withColumn("pri", f("pri").cast("int"))
      p.filter(Filters.severityRange(col("pri"), "emerg", "warning") &&
          Filters.facility(col("pri"), "daemon", "auth", "cron", "authpriv"))
        .select(col("conv_id"), col("turn_idx"),
          SyslogNames.facilityName(col("pri")).as("facility"),
          SyslogNames.severityName(col("pri")).as("severity"))
    }),

    "q_filter_cmp" -> ((s, dir) => {
      grokked(s, dir).filter(col("rule_id") === "kv")
        .filter(Filters.cmpTypeAware(f("duration_ms"), lit("999"), ">"))
        .select(col("conv_id"), col("turn_idx"),
          f("duration_ms").cast("int").as("duration_ms"))
    }),

    "q_filter_glob_inlist" -> ((s, dir) => {
      grokked(s, dir).filter(col("rule_id") === "syslog")
        .filter(Filters.matchGlob(f("host"), "host-?") &&
          Filters.inList(f("prog"), Seq("prog-0", "prog-2", "prog-4")) &&
          Filters.matchPrefix(f("action"), "log"))
        .select(col("conv_id"), col("turn_idx"),
          f("host").as("host"), f("prog").as("prog"), f("action").as("action"))
    }),

    "q_filter_netmask" -> ((s, dir) => {
      val p = grokked(s, dir).filter(col("rule_id") === "syslog")
        .withColumn("pri", f("pri").cast("int"))
        .withColumn("ip", concat_ws(".", lit("10"),
          SyslogNames.facilityNum(col("pri")).cast("string"),
          SyslogNames.severityNum(col("pri")).cast("string"),
          pmod(f("pid").cast("int"), lit(256)).cast("string")))
      p.filter(Filters.netmask(col("ip"), "10.4.0.0/16"))
        .select(col("conv_id"), col("turn_idx"), col("ip"))
    }),

    // ================= §2.6 rewrites =================
    "q_rewrite_subst" -> ((s, dir) => {
      transcripts(s, dir).select(col("conv_id"), col("turn_idx"),
        GraftFunctions.regexp_replace_first(col("text"), "\\d+", "#").as("d_first"),
        regexp_replace(col("text"), "\\d+", "#").as("d_global"))
    }),

    "q_rewrite_tags" -> ((s, dir) => {
      var p = grokked(s, dir)
      p = Rewrites.setTag(p, "tags", lit("has_status"), Some(f("status").isNotNull))
      p = Rewrites.setTag(p, "tags", lit("kv_line"), Some(col("rule_id") === "kv"))
      p.select(col("conv_id"), col("turn_idx"),
        concat_ws(",", array_sort(col("tags"))).as("tag_str"))
    }),

    // ================= §2.3 enrichment (add-contextual-data) =================
    "q_enrich" -> ((s, dir) => {
      ContextualData.enrich(
        transcripts(s, dir), ContextualData.lookupDf(s),
        coalesce(concat(lit("tool:"), col("tool")), concat(lit("role:"), col("role"))))
        .select(col("conv_id"), col("turn_idx"),
          col("team"), col("cost_class"), col("max_severity"))
    }),

    // ================= §2.7 routing =================
    "q_route" -> ((s, dir) => {
      Pipeline.flagged(s, dir)
        .select(col("conv_id"), col("turn_idx"), explode(col("routes")).as("sink"))
    }),

    "q_sink_counts" -> ((s, dir) => Pipeline.run(s, dir)),

    // ================= §2.4 grouping =================
    "q_group_lines" -> ((s, dir) => {
      transcripts(s, dir)
        .groupBy(col("conv_id"))
        .agg(count(lit(1)).as("n_turns"),
          concat_ws("\n",
            transform(array_sort(collect_list(struct(col("turn_idx"), col("text")))),
              x => x("text"))).as("joined"))
    }),

    // ================= relational baseline =================
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
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

    "q_parse_kv" -> Transcripts.oracle(
      """SELECT conv_id, turn_idx, 'tool_call' AS event,
           coalesce(tool, 'none') AS tool_field, duration_ms, okflag AS ok
         FROM transcripts_full WHERE variant = 1"""),

    "q_parse_json" -> Transcripts.oracle(
      """SELECT conv_id, turn_idx, 'turn' AS event, role AS role_j, tokens, status
         FROM transcripts_full WHERE variant = 2"""),

    "q_parse_csv" -> Transcripts.oracle(
      """SELECT conv_id, turn_idx, conv_id AS c_conv, turn_idx AS c_turn,
           role AS c_role, latency_ms
         FROM transcripts_full WHERE variant = 3"""),

    "q_parse_date" -> Transcripts.oracle(
      """SELECT conv_id, turn_idx,
           make_timestamp(2026, mon_num, dd, hh, mi, ss) AS event_ts
         FROM transcripts_full WHERE variant = 0"""),

    "q_filter_pri" -> Transcripts.oracle(
      """SELECT conv_id, turn_idx,
           CASE fac WHEN 3 THEN 'daemon' WHEN 4 THEN 'auth' WHEN 9 THEN 'cron' WHEN 10 THEN 'authpriv' END AS facility,
           CASE sev WHEN 0 THEN 'emerg' WHEN 1 THEN 'alert' WHEN 2 THEN 'crit' WHEN 3 THEN 'err' WHEN 4 THEN 'warning' END AS severity
         FROM transcripts_full WHERE variant = 0 AND sev <= 4 AND fac IN (3,4,9,10)"""),

    "q_filter_cmp" -> Transcripts.oracle(
      """SELECT conv_id, turn_idx, duration_ms
         FROM transcripts_full WHERE variant = 1 AND duration_ms > 999"""),

    "q_filter_glob_inlist" -> Transcripts.oracle(
      """SELECT conv_id, turn_idx,
           concat('host-', cast(hostnum AS varchar)) AS host,
           concat('prog-', cast(prognum AS varchar)) AS prog, action
         FROM transcripts_full
         WHERE variant = 0 AND prognum IN (0,2,4) AND action IN ('login','logout')"""),

    "q_filter_netmask" -> Transcripts.oracle(
      """SELECT conv_id, turn_idx,
           concat('10.', cast(fac AS varchar), '.', cast(sev AS varchar), '.', cast(pid % 256 AS varchar)) AS ip
         FROM transcripts_full WHERE variant = 0 AND fac = 4"""),

    "q_rewrite_subst" -> Transcripts.oracle(
      """SELECT conv_id, turn_idx,
           regexp_replace(text, '\d+', '#') AS d_first,
           regexp_replace(text, '\d+', '#', 'g') AS d_global
         FROM transcripts"""),

    "q_rewrite_tags" -> Transcripts.oracle(
      """SELECT conv_id, turn_idx,
           CASE WHEN variant = 4 THEN 'msg.parse_error'
                WHEN variant IN (0,2) THEN 'has_status'
                WHEN variant = 1 THEN 'kv_line'
                ELSE '' END AS tag_str
         FROM transcripts_full"""),

    "q_enrich" -> Transcripts.oracle(
      s""", lk AS (SELECT * FROM ${ContextualData.lookupSqlValues})
         , dflt AS (SELECT team AS d_team, cost_class AS d_cost, max_severity AS d_max
                    FROM lk WHERE selector = 'default')
         SELECT t.conv_id, t.turn_idx,
           coalesce(h.team, d.d_team) AS team,
           coalesce(h.cost_class, d.d_cost) AS cost_class,
           coalesce(h.max_severity, d.d_max) AS max_severity
         FROM transcripts t
         LEFT JOIN lk h ON h.selector = coalesce('tool:' || t.tool, 'role:' || t.role)
         CROSS JOIN dflt d"""),

    "q_route" -> Transcripts.oracle(
      s"""SELECT conv_id, turn_idx, 'all' AS sink FROM transcripts_full
         UNION ALL SELECT conv_id, turn_idx, 'tool_calls' FROM transcripts_full WHERE $R_TOOL
         UNION ALL SELECT conv_id, turn_idx, 'errors' FROM transcripts_full WHERE $R_ERR
         UNION ALL SELECT conv_id, turn_idx, 'fallback' FROM transcripts_full WHERE NOT ($R_TOOL OR $R_ERR)"""),

    "q_sink_counts" -> Transcripts.oracle(
      s""", routed AS (
           SELECT 'all' AS sink, role, tool, ts FROM transcripts_full
           UNION ALL SELECT 'tool_calls', role, tool, ts FROM transcripts_full WHERE $R_TOOL
           UNION ALL SELECT 'errors', role, tool, ts FROM transcripts_full WHERE $R_ERR
           UNION ALL SELECT 'fallback', role, tool, ts FROM transcripts_full WHERE NOT ($R_TOOL OR $R_ERR)
         )
         SELECT sink, role, coalesce(tool, 'none') AS tool,
                date_trunc('hour', ts) AS bucket, count(*) AS n
         FROM routed GROUP BY 1, 2, 3, 4"""),

    "q_group_lines" -> Transcripts.oracle(
      """SELECT conv_id, count(*) AS n_turns,
           string_agg(text, chr(10) ORDER BY turn_idx) AS joined
         FROM transcripts GROUP BY conv_id"""),

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY 1, 2"""
  )
}
