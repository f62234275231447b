package graft

import org.apache.spark.sql.functions._

import graft.config.ConfigText

/** Text config grammar → compiled plan: the reference's end-user surface
  * (config text with source/filter/parser/rewrite/destination blocks and
  * log paths) running against the transcript fixture.
  */
class ConfigTextSpec extends SparkSpec {
  import spark.implicits._

  test("full text config: parse, route with final+fallback, grok fields in filters") {
    val cfg = s"""
      # transcripts in, three destinations out
      source s_app { transcripts("$sfUnit"); };

      parser p_grok { db-parser(); };

      filter f_err  { match("^(error|fail)$$" value("status")); };
      filter f_tool { match("tool_call" value("event")); };

      rewrite r_tag { set-tag("checked"); };

      destination d_err  { file("errors"); };
      destination d_tool { file("tool_calls"); };
      destination d_rest { file("rest"); };

      log { source(s_app); parser(p_grok); filter(f_tool); rewrite(r_tag);
            destination(d_tool); flags(final); };
      log { source(s_app); filter(f_err); destination(d_err); };
      log { source(s_app); destination(d_rest); flags(fallback); };
    """
    val c = ConfigText.compile(spark, cfg)
    val t = graft.transcripts.Transcripts.loadFull(spark, sfUnit)

    val nTool = c.sink("tool_calls").count()
    val nErr = c.sink("errors").count()
    val nRest = c.sink("rest").count()
    val total = t.count()

    // ground truth from the generator columns (every kv-variant line is a
    // tool_call event)
    val toolTruth = t.filter(col("variant") === 1).count()
    assert(nTool === toolTruth)
    // errors: status error/fail on syslog+json variants, minus rows consumed
    // by the final tool path (kv rows have no status field here)
    val errTruth = t.filter(col("variant").isin(0, 2) &&
      col("status").isin("error", "fail")).count()
    assert(nErr === errTruth)
    assert(nTool + nErr + nRest === total) // partition: final ∪ err ∪ fallback
  }

  test("grouping-by(): trigger + prefix + aggregate-only (test_grouping_by.c:65-125 shape)") {
    val cfg = s"""
      source s { transcripts("$sfUnit"); };
      parser p { grouping-by(key("$$conv_id")
                   order("$$turn_idx")
                   timeout(3600)
                   aggregate(
                     value("aggr" "$$(context-values $$role)")
                     value("n" "$$(context-length)")
                   )
                   prefix("gb_")
                   inject-mode(aggregate-only)
                   trigger("$$(context-length)" == "3")); };
      destination d { file("out"); };
      log { source(s); parser(p); destination(d); };
    """
    val out = ConfigText.compile(spark, cfg).sink("out")
    // the config surface must answer the library plan exactly
    import graft.operators.Correlation
    val t = graft.transcripts.Transcripts.load(spark, sfUnit)
    val expected = Correlation.groupingByTriggered(
      t, Seq(col("conv_id").as("key")), col("ts").cast("timestamp"),
      timeoutSeconds = 3600L, triggerCount = 3,
      aggs = Seq(
        graft.functions.ListValues.list_encode(
          Correlation.Context.values(col("role"), col("turn_idx"))).as("gb_aggr"),
        Correlation.Context.length.cast("string").as("gb_n")),
      tieBreak = Seq(col("turn_idx")))
    val got = out.select("key", "gb_aggr", "gb_n").as[(String, String, String)]
      .collect().sorted.toSeq
    val want = expected.select("key", "gb_aggr", "gb_n").as[(String, String, String)]
      .collect().sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty && got.exists(_._3 === "3")) // full trigger blocks exist
  }

  test("grouping-by(): sort-key() orders the context before aggregation; " +
      "having() filters; pass-through is the default inject mode") {
    val cfg = s"""
      source s { transcripts("$sfUnit"); };
      parser p { grouping-by(key("$$conv_id")
                   order("$$turn_idx")
                   timeout(7200)
                   sort-key("$$role")
                   aggregate(
                     value("roles" "$$(context-values $$role)")
                     value("last_role" "$$role")
                   )
                   having("$$roles" ne "")); };
      destination d { file("out"); };
      log { source(s); parser(p); destination(d); };
    """
    val out = ConfigText.compile(spark, cfg).sink("out")

    import graft.operators.Correlation
    val t = graft.transcripts.Transcripts.load(spark, sfUnit)
    val sortOrd = struct(coalesce(col("role").cast("string"), lit("")).as("__sk"),
      col("turn_idx").as("__ao"))
    val expected = Correlation.groupingBy(
      t, Seq(col("conv_id").as("key")), col("ts").cast("timestamp"), "7200 seconds",
      aggs = Seq(
        graft.functions.ListValues.list_encode(
          Correlation.Context.values(col("role"), sortOrd)).as("roles"),
        max_by(coalesce(col("role").cast("string"), lit("")), sortOrd).as("last_role")))
    // synthetic rows only (originals have null `roles`)
    val got = out.filter(col("roles").isNotNull)
      .select("key", "roles", "last_role").as[(String, String, String)]
      .collect().sorted.toSeq
    val want = expected.select("key", "roles", "last_role")
      .as[(String, String, String)].collect().sorted.toSeq
    assert(got === want)
    // sort-key really re-orders: some context's role sequence is NOT in
    // arrival order (roles cycle user→assistant→…, sorted is grouped)
    val arrival = Correlation.groupingBy(
      t, Seq(col("conv_id").as("key")), col("ts").cast("timestamp"), "7200 seconds",
      aggs = Seq(graft.functions.ListValues.list_encode(
        Correlation.Context.values(col("role"), col("turn_idx"))).as("roles")))
      .select("key", "roles").as[(String, String)].collect().toMap
    assert(want.exists { case (k, roles, _) => arrival(k) != roles })
    // pass-through: original rows ride along under the synthetics
    assert(out.count() === expected.count() + t.count())
  }

  test("if/elif/else + junction in text form") {
    val cfg = s"""
      source s_app { transcripts("$sfUnit"); };
      destination d_user { file("user"); };
      destination d_asst { file("asst"); };
      destination d_oth  { file("oth"); };
      destination d_all  { file("all"); };
      log { source(s_app);
            junction {
              channel { if (match("^user$$" value("role"))) { destination(d_user); }
                        elif (match("^assistant$$" value("role"))) { destination(d_asst); }
                        else { destination(d_oth); } };
              channel { destination(d_all); };
            }; };
    """
    val c = ConfigText.compile(spark, cfg)
    val t = graft.transcripts.Transcripts.load(spark, sfUnit)
    assert(c.sink("user").count() === t.filter(col("role") === "user").count())
    assert(c.sink("asst").count() === t.filter(col("role") === "assistant").count())
    assert(c.sink("oth").count() === t.filter(!col("role").isin("user", "assistant")).count())
    assert(c.sink("all").count() === t.count())
  }

  test("kv/csv parser drivers and rewrite drivers from text") {
    val cfg = s"""
      source s_app { transcripts("$sfUnit"); };
      parser p_kv { kv-parser(value("text") prefix("kv")); };
      rewrite r { subst("tool_call", "T", value("text")); rename(conv_id, conversation); };
      destination d { file("out"); };
      log { source(s_app); parser(p_kv); rewrite(r); destination(d); };
    """
    val c = ConfigText.compile(spark, cfg)
    val out = c.sink("out")
    assert(out.columns.contains("conversation") && out.columns.contains("kv"))
    // parser ran before the rewrite: the kv map still sees the original
    // text, while the text column itself was substituted afterwards
    val kvRows = out.filter(col("kv")("event") === "tool_call").count()
    assert(kvRows > 0)
    assert(out.filter(col("text").contains("tool_call")).count() === 0)
  }

  test("filter() call inside a filter expression (reference filter-call)") {
    val cfg = s"""
      source s { transcripts("$sfUnit"); };
      parser p { db-parser(); };
      filter f_err { match("^(error|fail)$$" value("status")); };
      filter f_errtool { filter(f_err) or match("tool_call" value("event")); };
      destination d { file("hits"); };
      log { source(s); parser(p); filter(f_errtool); destination(d); };
    """
    val c = graft.config.ConfigText.compile(spark, cfg)
    val t = graft.transcripts.Transcripts.loadFull(spark, sfUnit)
    val truth = t.filter(
      (col("variant").isin(0, 2) && col("status").isin("error", "fail")) ||
        col("variant") === 1).count()
    assert(c.sink("hits").count() === truth)
  }

  test("@version pragma + @include splicing") {
    val inc = java.nio.file.Files.createTempFile("graft-inc", ".conf")
    java.nio.file.Files.write(inc,
      s"""filter f_inc { match("tool_call" value("event")); };""".getBytes)
    val cfg = s"""
      @version: 4.8
      @include "$inc"
      source s { transcripts("$sfUnit"); };
      parser p { db-parser(); };
      destination d { file("hits"); };
      log { source(s); parser(p); filter(f_inc); destination(d); };
    """
    val (expanded, version) = graft.config.ConfigText.preprocess(cfg)
    assert(version === "4.8" && expanded.contains("f_inc") && !expanded.contains("@include"))
    val c = graft.config.ConfigText.compile(spark, cfg)
    val truth = graft.transcripts.Transcripts.loadFull(spark, sfUnit)
      .filter(col("variant") === 1).count()
    assert(c.sink("hits").count() === truth)
  }

  test("db-parser(file()) loads patterndb XML; csv-parser(dialect()) scans quoted") {
    val rulesFile = java.nio.file.Files.createTempFile("graft-pdb", ".xml")
    java.nio.file.Files.write(rulesFile,
      """<patterndb version="4"><ruleset name="kv" id="r"><rules>
        |<rule id="kvline" class="app"><patterns>
        |<pattern>event=@ESTRING:ev: @tool=@ESTRING:tl: @duration_ms=@NUMBER:dur@ ok=@ANYSTRING:okv@</pattern>
        |</patterns></rule></rules></ruleset></patterndb>""".stripMargin.getBytes)
    val cfg = s"""
      source s { transcripts("$sfUnit"); };
      parser p { db-parser(file("$rulesFile")); };
      filter f { match("kvline" value("pdb_rule")); };
      destination d { file("kv"); };
      log { source(s); parser(p); filter(f); destination(d); };
    """
    val c = graft.config.ConfigText.compile(spark, cfg)
    val hits = c.sink("kv")
    val truth = graft.transcripts.Transcripts.loadFull(spark, sfUnit)
      .filter(col("variant") === 1)
    assert(hits.count() === truth.count())
    // typed promotion happened: dur is bigint
    assert(hits.schema("dur").dataType === org.apache.spark.sql.types.LongType)
  }

  test("filterx blocks: named + inline, drop semantics, branch-guarded writes") {
    val cfg = s"""
      source s { transcripts("$sfUnit"); };

      # named top-level block (reference filterx-pipe.c rule form)
      filterx fx_route {
        $$role != 'system';
        if ($$role == 'tool') { $$kind = 'T'; }
        else { $$kind = len($$text) > 40 ? 'long' : 'short'; };
      };

      destination d_main { file("main"); };
      destination d_rest { file("rest"); };

      log { source(s); filterx(fx_route); destination(d_main); flags(final); };
      log { source(s); filterx { $$role == 'system'; $$kind = 'SYS'; };
            destination(d_rest); };
    """
    val c = ConfigText.compile(spark, cfg)
    val t = graft.transcripts.Transcripts.load(spark, sfUnit)

    val main = c.sink("main")
    val rest = c.sink("rest")
    assert(main.count() === t.filter(col("role") =!= "system").count())
    assert(rest.count() === t.filter(col("role") === "system").count())
    assert(main.where(col("role") === "tool" && col("kind") =!= "T").count() === 0)
    assert(rest.select("kind").distinct().as[String].collect().toSeq === Seq("SYS"))
    // branch-guarded: non-tool rows got long/short, never T
    assert(main.where(col("role") =!= "tool" && col("kind") === "T").count() === 0)
  }

  test("file(format(text)) source: raw log lines parse and route end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-txt")
    val lines = Seq(
      "<13>Jan  1 00:00:01 host-1 prog-2[99]: action=read status=ok",
      "<13>Jan  1 00:00:02 host-1 prog-2[99]: action=write status=error",
      "not a syslog line at all")
    java.nio.file.Files.write(dir.resolve("app.log"),
      lines.mkString("\n").getBytes("UTF-8"))
    val cfg = s"""
      source s_txt { file("$dir/*.log" format(text)); };
      parser p { db-parser(); };
      filter f_err { match("^error$$" value("status")); };
      destination d_err { file("errors"); };
      destination d_rest { file("rest"); };
      log { source(s_txt); parser(p); filter(f_err); destination(d_err); flags(final); };
      log { source(s_txt); destination(d_rest); flags(fallback); };
    """
    val c = ConfigText.compile(spark, cfg)
    assert(c.sink("errors").count() === 1)
    assert(c.sink("rest").count() === 2) // ok line + unparsed garbage
    val errRow = c.sink("errors").select("text", "src_file").head()
    assert(errRow.getString(0).contains("status=error"))
    assert(errRow.getString(1).endsWith("app.log"))
  }

  test("block generators: parameterized config macros expand with defaults and overrides") {
    val cfg = s"""
      block filter status-is(val("ok")) {
        match("^`val`$$" value("status"))
      };
      block parser parse-then-tag(tag("seen")) {
        db-parser();
      };
      source s { transcripts("$sfUnit"); };
      parser p { parse-then-tag(); };
      filter f_err { status-is(val("error")) or status-is(val("fail")); };
      destination d { file("errs"); };
      log { source(s); parser(p); filter(f_err); destination(d); };
    """
    val expanded = graft.config.ConfigText.expandBlocks(cfg)
    assert(!expanded.contains("block ") && expanded.contains("^error$"))
    val c = graft.config.ConfigText.compile(spark, cfg)
    val truth = graft.transcripts.Transcripts.loadFull(spark, sfUnit)
      .filter(col("variant").isin(0, 2) && col("status").isin("error", "fail")).count()
    assert(c.sink("errs").count() === truth)
  }

  test("template blocks: named user templates callable as $(NAME); set() values are templates") {
    val cfg = s"""
      source s_app { transcripts("$sfUnit"); };
      template t_who { template("$${role}#$${conv_id}"); template-escape(no); };
      rewrite r_lbl { set("$$(t_who)/$$(uppercase $${role})" value("label")); };
      destination d_all { file("labeled"); };
      log { source(s_app); rewrite(r_lbl); destination(d_all); };
    """
    val c = ConfigText.compile(spark, cfg)
    val got = c.sink("labeled").select("conv_id", "role", "label")
    assert(got.filter(col("label") =!=
      concat(col("role"), lit("#"), col("conv_id"), lit("/"), upper(col("role"))))
      .count() === 0)
    // plain literals stay literal
    val cfg2 = s"""
      source s_app { transcripts("$sfUnit"); };
      rewrite r_k { set("const" value("k")); };
      destination d { file("out"); };
      log { source(s_app); rewrite(r_k); destination(d); };
    """
    val c2 = ConfigText.compile(spark, cfg2)
    assert(c2.sink("out").filter(col("k") =!= "const").count() === 0)
  }

  test("syslog-parser(): full RFC3164 classification driver with flags") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sl")
    java.nio.file.Files.write(dir.resolve("mixed.log"), Seq(
      "<15>Jan  1 01:00:00 bzorp openvpn[2499]: PTHREAD support initialized",
      "<190>Apr 15 2007 21:28:13: %PIX-6-302014: Teardown TCP connection",
      "no pri at all here").mkString("\n").getBytes("UTF-8"))
    val cfg = s"""
      source s { file("$dir/*.log" format(text)); };
      parser p { syslog-parser(flags(expect-hostname) time-zone("CET")
                               recv-time(1549615069123000)); };
      filter f { "$${sl_prog}" eq "openvpn" };
      destination d_vpn { file("vpn"); };
      destination d_rest { file("rest"); };
      log { source(s); parser(p); filter(f); destination(d_vpn); flags(final); };
      log { source(s); parser(p); destination(d_rest); flags(fallback); };
    """
    val c = ConfigText.compile(spark, cfg)
    val vpn = c.sink("vpn")
    assert(vpn.count() === 1)
    val row = vpn.select("sl_host", "sl_pid", "sl_pri", "sl_msg").head()
    assert(row.getString(0) === "bzorp" && row.getString(1) === "2499")
    assert(row.getInt(2) === 15 && row.getString(3) === "PTHREAD support initialized")
    val rest = c.sink("rest")
    assert(rest.count() === 2)
    assert(rest.where(col("sl_prog") === "%PIX-6-302014").count() === 1)
    // missing-PRI line got the default pri + tag
    val noPri = rest.where(array_contains(col("sl_tags"), "syslog.missing_pri"))
    assert(noPri.count() === 1 && noPri.select("sl_pri").head().getInt(0) === 13)
  }

  test("filter comparisons: template OP template with eq/numeric ops (filter-cmp.c)") {
    val cfg = s"""
      source s { transcripts("$sfUnit"); };
      # bare and quoted operands both parse (test_filters_fop_cmp.c forms)
      filter f { $$turn_idx >= 3 and not ("$${role}" eq "system") and 10 == 10 };
      destination d { file("hits"); };
      log { source(s); filter(f); destination(d); };
    """
    val c = ConfigText.compile(spark, cfg)
    val t = graft.transcripts.Transcripts.loadFull(spark, sfUnit)
    val want = t.filter(col("turn_idx") >= 3 && col("role") =!= "system").count()
    assert(want > 0 && c.sink("hits").count() === want)
    // string compare: "10" lt "9" lexicographically true, numerically false
    val cfg2 = s"""
      source s { transcripts("$sfUnit"); };
      filter f_str { "10" lt "9" };
      filter f_num { "10" < "9" };
      destination d1 { file("str"); };
      destination d2 { file("num"); };
      log { source(s); filter(f_str); destination(d1); };
      log { source(s); filter(f_num); destination(d2); };
    """
    val c2 = ConfigText.compile(spark, cfg2)
    assert(c2.sink("str").count() === t.count() && c2.sink("num").count() === 0)
  }

  test("unset() inside an if branch nulls only branch rows (column survives elsewhere)") {
    val cfg = s"""
      source s { transcripts("$sfUnit"); };
      rewrite r_un { unset(value("tool")); };
      destination d { file("out"); };
      log { source(s);
        if (match("^assistant$$" value("role"))) { rewrite(r_un); };
        destination(d); };
    """
    val out = ConfigText.compile(spark, cfg).sink("out")
    val t = graft.transcripts.Transcripts.loadFull(spark, sfUnit)
    assert(out.columns.contains("tool")) // column not globally dropped
    assert(out.where(col("role") === "assistant" && col("tool").isNotNull).count() === 0)
    assert(out.where(col("role") === "tool" && col("tool").isNotNull).count() ===
      t.where(col("role") === "tool" && col("tool").isNotNull).count())
  }

  test("macros resolve on grok-parsed frames; drop-invalid routes per path (review fixes)") {
    // $FACILITY in a set() on a frame WITH a fields map must hit the macro
    // family, not a null fields['FACILITY'] lookup
    val cfg = s"""
      source s { transcripts("$sfUnit"); };
      parser p { db-parser(); };
      rewrite r { set("$$FACILITY" value("facname")); };
      destination d { file("out"); };
      log { source(s); parser(p); rewrite(r); destination(d); };
    """
    val out = ConfigText.compile(spark, cfg).sink("out")
    assert(out.where(col("facname").isNull || col("facname") === "").count() === 0)
    // drop-invalid: a row failing the parse leaves THIS path, but still
    // reaches a parallel path reading the same source
    val dir = java.nio.file.Files.createTempDirectory("graft-di")
    java.nio.file.Files.write(dir.resolve("x.log"),
      "a,b\nnot csv at all".getBytes("UTF-8"))
    val cfg2 = s"""
      source s { file("$dir/*.log" format(text)); };
      parser p { csv-parser(columns(c1, c2) delimiters(',')
                            flags(drop-invalid, escape-none)); };
      destination d_ok { file("ok"); };
      destination d_all { file("all"); };
      log { source(s); parser(p); destination(d_ok); };
      log { source(s); destination(d_all); };
    """
    val c2 = ConfigText.compile(spark, cfg2)
    assert(c2.sink("ok").count() === 1)   // only the well-formed row
    assert(c2.sink("all").count() === 2)  // the invalid row was NOT dropped globally
  }

  test("postgresql-csvlog-parser SCL: typed columns, double-char quotes, severity shifts (test_postgresql_csvlog_parser.py)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pg")
    java.nio.file.Files.write(dir.resolve("pg.log"), Seq(
      // v15 line: 26 fields, quoted message with doubled quotes + commas
      "2023-09-20 16:50:02.165 CET,,,407764,,650b069a.638d4,2,,2023-09-20 16:50:02 CET,,0,DEBUG3,00000,\"starting PostgreSQL 15.4, 64-bit\",,,,,,,,,\"\",\"postmaster\",,0",
      // v12-style line: only 24 fields — trailing columns stay unset
      "2023-08-08 12:05:52.805 UTC,,,22113,,64d22fa0.5661,1,,2023-08-08 12:05:52 UTC,23/74060,0,WARNING,00000,\"vacuum of \"\"tablename\"\": 0 removed, 4 remain\",,,,,,,,,\"\"")
      .mkString("\n").getBytes("UTF-8"))
    val cfg = s"""
      block parser postgresql-csvlog-parser(prefix('pg_')) {
        csv-parser(columns("`prefix`timestamp", "`prefix`username", "`prefix`database",
                           int("`prefix`pid"), "`prefix`connection_from", "`prefix`session_id",
                           int("`prefix`session_line_num"), "`prefix`command_tag",
                           "`prefix`session_start_time", "`prefix`virtual_transaction_id",
                           "`prefix`transaction_id", "`prefix`severity", "`prefix`sql_state_code",
                           "`prefix`message", "`prefix`detail", "`prefix`hint",
                           "`prefix`internal_query", int("`prefix`internal_query_pos"),
                           "`prefix`context", "`prefix`query", int("`prefix`query_pos"),
                           "`prefix`location", "`prefix`application_name", "`prefix`backend_type",
                           int("`prefix`leader_pid"), int("`prefix`query_id"))
                   delimiters(',') dialect(escape-double-char)
                   flags(strip-whitespace) quote-pairs('""')
                   on-type-error("drop-property"));
        date-parser(format('%Y-%m-%d %H:%M:%S.%f')
                    template("$$(substr $${`prefix`timestamp} 0 23)"));
      };
      source s { file("$dir/*.log" format(text)); };
      parser p { postgresql-csvlog-parser(); };
      rewrite r_sev {
        set-severity("$${pg_severity}");
        set-severity("$$(+ $$SEVERITY_NUM 1)" condition($$SEVERITY_NUM == 0));
        set-severity("$$(+ $$SEVERITY_NUM 1)" condition($$SEVERITY_NUM <= 4));
        set-severity("debug" condition(match("^DEBUG" value("pg_severity"))));
      };
      destination d { file("out"); };
      log { source(s); parser(p); rewrite(r_sev); destination(d); };
    """
    val out = ConfigText.compile(spark, cfg).sink("out")
    assert(out.count() === 2)
    val v15 = out.where(col("pg_session_line_num") === 2)
    assert(v15.select("pg_pid").head().getLong(0) === 407764L) // typed int
    assert(v15.select("pg_message").head().getString(0) === "starting PostgreSQL 15.4, 64-bit")
    assert(v15.select("pg_backend_type").head().getString(0) === "postmaster")
    assert(v15.select("pg_query_id").head().getLong(0) === 0L)
    // DEBUG3 → debug (severity 7); pri facility preserved (user=1 → 15)
    assert(v15.select("pri").head().getInt(0) % 8 === 7)
    // event time parsed from the first 23 chars of the timestamp column
    assert(v15.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS")).head().getString(0)
      === "2023-09-20 16:50:02.165")

    val v12 = out.where(col("pg_session_line_num") === 1)
    assert(v12.select("pg_message").head().getString(0) === "vacuum of \"tablename\": 0 removed, 4 remain")
    assert(v12.select("pg_backend_type").head().isNullAt(0)) // missing trailing col
    assert(v12.where(col("csv_invalid")).count() === 1) // flagged, NOT dropped
    // WARNING = 4 → shifted to notice (5)
    assert(v12.select("pri").head().getInt(0) % 8 === 5)
  }

  test("@define pragma: backtick refs splice the defined value (cfg-lexer pragmas)") {
    val cfg = s"""
      @define pat 'error|fail'
      source s { transcripts("$sfUnit"); };
      parser p { db-parser(); };
      filter f { match("^(`pat`)$$" value("status")); };
      destination d { file("hits"); };
      log { source(s); parser(p); filter(f); destination(d); };
    """
    val c = ConfigText.compile(spark, cfg)
    val truth = graft.transcripts.Transcripts.loadFull(spark, sfUnit)
      .filter(col("variant").isin(0, 2) && col("status").isin("error", "fail")).count()
    assert(truth > 0 && c.sink("hits").count() === truth)
  }

  test("mariadb-audit-parser SCL: quote-pairs + escape-backslash csv, regexp split (test_mariadb_audit_parser.py)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mdb")
    java.nio.file.Files.write(dir.resolve("in.log"), Seq(
      "<190>Apr 13 14:43:13 mysql-server_auditing: columnstore-1 eff8a68bcd7f,user1,172.18.0.1,32,394,QUERY,syslog_ng,'SELECT * FROM test WHERE 0=1',1146",
      "<190>Sep 14 17:46:51 centos mysql-server_auditing: columnstore-1 centos,root,localhost,11,117,QUERY,loans,'SELECT grade, AVG(loan_amnt) avg,FROM loanstats GROUP BY grade ORDER BY grade',0",
      "<190>Apr 29 13:56:36 mysql-server_auditing: docker eff8a68bcd7f,root,172.18.0.3,13,0,CONNECT,,,0")
      .mkString("\n").getBytes("UTF-8"))
    // the reference's scl/mariadb/audit.conf block, body flattened to the
    // engine's chained-driver form; instantiated over the parsed message
    val cfg = s"""
      block parser mariadb-audit-parser(prefix('mdb_') template("$$sl_msg")) {
        csv-parser(columns('`prefix`serverhost', '`prefix`username', '`prefix`host',
                           '`prefix`connectionid', '`prefix`queryid', '`prefix`operation',
                           '`prefix`database', '`prefix`object', '`prefix`retcode')
                   delimiters(',') template(`template`)
                   flags(greedy, drop-invalid, escape-backslash)
                   quote-pairs("''"));
        regexp-parser(prefix(`prefix`)
                      patterns('^\\s*(?<syslog_info>\\S*?)(?: )?(?<serverhost>\\S+)$$')
                      template('$${`prefix`serverhost}'));
      };
      source s { file("$dir/*.log" format(text)); };
      parser p0 { syslog-parser(flags(expect-hostname) recv-time(1549615069123000)); };
      parser p { mariadb-audit-parser(); };
      destination d { file("out"); };
      log { source(s); parser(p0); parser(p); destination(d); };
    """
    val out = ConfigText.compile(spark, cfg).sink("out")
    assert(out.count() === 3)
    val r1 = out.where(col("mdb_queryid") === "394")
      .select("mdb_syslog_info", "mdb_serverhost", "mdb_username", "mdb_host",
        "mdb_connectionid", "mdb_operation", "mdb_database", "mdb_object", "mdb_retcode")
      .head()
    assert(r1.toSeq === Seq("columnstore-1", "eff8a68bcd7f", "user1", "172.18.0.1",
      "32", "QUERY", "syslog_ng", "SELECT * FROM test WHERE 0=1", "1146"))
    // commas inside the quoted object stay one field
    val r2 = out.where(col("mdb_queryid") === "117").select("mdb_object", "mdb_serverhost").head()
    assert(r2.getString(0) === "SELECT grade, AVG(loan_amnt) avg,FROM loanstats GROUP BY grade ORDER BY grade")
    assert(r2.getString(1) === "centos")
    // empty trailing fields parse as empty strings
    val r3 = out.where(col("mdb_operation") === "CONNECT")
      .select("mdb_database", "mdb_object", "mdb_retcode", "mdb_syslog_info").head()
    assert(r3.toSeq === Seq("", "", "0", "docker"))
  }

  test("checkpoint SCL: syslog + splunk log-exporter formats " +
      "(scl/checkpoint/plugin.conf, light test_checkpoint.py samples)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cp")
    val syslogLine = """<134>1 2019-11-27T02:58:25Z ABDP-CPLOG01 CheckPoint 22103 - [action:"Accept"; flags:"18692"; ifdir:"inbound"; ifname:"bond1.734"; loguid:"{0x5ddde651,0x48,0xca96040a,0xc000001b}"; origin:"10.4.150.2"; time:"1574823505"; version:"1"; __policy_id_tag:"product=VPN-1 & FireWall-1[db_tag={12D7A082-42F0-B240-8103-29F2F6FF139C};mgmt=ABDP-MGT01;date=1573204576;policy_name=Cutover_Final_V3_20161031]"; dst:"124.156.190.9"; nat_addtnl_rulenum:"1"; nat_rulenum:"8"; proto:"6"; rule:"8"; rule_name:"3G IP Pool Outgoing"; s_port:"64442"; service:"80"; service_id:"http"; src:"10.7.79.7"; xlatedport:"0"; xlatedst:"0.0.0.0"; xlatesport:"49254"; xlatesrc:"202.1.50.67"; ]"""
    // light-test sample 0: SPACE-separated date (the reference's 8-column
    // else-branch, "checkpoint's RFC5424 is utterly wrong")
    val spaceDateLine = """<134>1 2018-03-21 17:25:25 MDS-72 CheckPoint 13752 - [action:"Update"; flags:"150784"; ifdir:"inbound"; logid:"160571424"; origin:"192.168.32.91"; sequencenum:"1"; time:"1521645925"; version:"5"; product:"Identity Awareness"; src:"192.168.32.69";]"""
    val splunkLine = "time=1557767758|hostname=r80test|product=Firewall|layer_name=Network|layer_uuid=c0264a80-1832-4fce-8a90-d0849dc4ba33|match_id=1|parent_rule=0|rule_action=Accept|rule_uid=4420bdc0-19f3-4a3e-8954-03b742cd3aee|action=Accept|ifdir=inbound|ifname=eth0|logid=0|loguid={0x5cd9a64e,0x0,0x5060a8c0,0xc0000001}|origin=192.168.96.80|sequencenum=1|version=5|dst=192.168.96.80|inzone=Internal|outzone=Local|proto=6|s_port=63945|service=443|service_id=https|src=192.168.96.27|"
    java.nio.file.Files.write(dir.resolve("in.log"),
      (syslogLine + "\n" + spaceDateLine + "\n" + splunkLine).getBytes("UTF-8"))
    // scl/checkpoint/plugin.conf's block, flattened: the nested if/else
    // channels become path-level format dispatches; the "syslog" branch
    // splits on the ISO-vs-space stamp (the reference tries the 7-column
    // parse and falls back to 8 columns), then the ':'/';' kv scan; the
    // "splunk" branch is the '|'/'=' kv scan (the originsicname \= escape
    // edge is the reference's own declared weak spot and not asserted)
    val cfg = s"""
      block parser checkpoint-syslog-parser(prefix('cp_')) {
        csv-parser(columns('cp1', 'cp2', 'cp_host', 'cp_program', 'cp_pid', 'cp_msgid', 'cp_msg')
                   flags(greedy) delimiters(' ') null('-') dialect(escape-none));
        date-parser(format('%Y-%m-%dT%H:%M:%S%z', '%Y-%m-%dT%H:%M:%S') template('$$cp2'));
        kv-parser(prefix(`prefix`) value-separator(':') pair-separator(';') value('cp_msg'));
      };
      block parser checkpoint-syslog-spacedate-parser(prefix('cp_')) {
        csv-parser(columns('cp1', 'cp2', 'cp3', 'cp_host', 'cp_program', 'cp_pid', 'cp_msgid', 'cp_msg')
                   flags(greedy) delimiters(' ') null('-') dialect(escape-none));
        date-parser(format('%Y-%m-%d %H:%M:%S') template('$$cp2 $$cp3'));
        kv-parser(prefix(`prefix`) value-separator(':') pair-separator(';') value('cp_msg'));
      };
      block parser checkpoint-splunk-parser(prefix('cp_')) {
        kv-parser(prefix(`prefix`) value-separator('=') pair-separator('|'));
      };
      source s { file("$dir/*.log" format(text)); };
      parser p_sys { checkpoint-syslog-parser(); };
      parser p_sp  { checkpoint-syslog-spacedate-parser(); };
      parser p_spl { checkpoint-splunk-parser(); };
      destination d { file("out"); };
      log { source(s);
            if (message("^<[0-9]{1,3}>1 [0-9-]+T.* CheckPoint ")) { parser(p_sys); }
            elif (message("^<[0-9]{1,3}>1 .* CheckPoint ")) { parser(p_sp); }
            else { parser(p_spl); };
            destination(d); };
    """
    val out = ConfigText.compile(spark, cfg).sink("out")
    assert(out.count() === 3)
    // space-date branch: 8-column split, two-token date, same kv fields
    val sp = out.where(col("cp_host") === "MDS-72")
    val spr = sp.select(col("cp_program"), col("cp_pid"),
      try_element_at(col("cp_fields"), lit("action")),
      try_element_at(col("cp_fields"), lit("product")), col("ts")).head()
    assert(spr.getString(0) === "CheckPoint" && spr.getString(1) === "13752")
    assert(spr.getString(2) === "Update" && spr.getString(3) === "Identity Awareness")
    assert(spr.getAs[java.time.LocalDateTime](4)
      === java.time.LocalDateTime.parse("2018-03-21T17:25:25"))
    def fld(k: String) = try_element_at(col("cp_fields"), lit(k))
    val sys0 = out.where(col("cp_host") === "ABDP-CPLOG01")
    val r = sys0.select(col("cp_program"), col("cp_pid"), col("cp_msgid"),
      fld("action"), fld("ifname"), fld("proto"), fld("s_port"),
      fld("__policy_id_tag")).head()
    assert(r.getString(0) === "CheckPoint" && r.getString(1) === "22103")
    assert(r.getString(2) === "") // null('-') scans the msgid dash as empty
    assert(r.getString(3) === "Accept" && r.getString(4) === "bond1.734")
    assert(r.getString(5) === "6" && r.getString(6) === "64442")
    // quoted value keeps its embedded ';' '=' '[' intact
    assert(r.getString(7).contains("policy_name=Cutover_Final_V3_20161031"))
    assert(sys0.select("ts").head().getAs[java.time.LocalDateTime](0)
      === java.time.LocalDateTime.parse("2019-11-27T02:58:25"))
    val spl = out.where(fld("hostname") === "r80test")
      .select(fld("action"), fld("product"), fld("src"), fld("loguid")).head()
    assert(spl.toSeq === Seq("Accept", "Firewall", "192.168.96.27",
      "{0x5cd9a64e,0x0,0x5060a8c0,0xc0000001}"))
  }

  test("postgresql-csvlog SCL: 27 typed columns, escape-double-char quotes, " +
      "%f date (scl/pgsql/pgsql.conf, light test samples)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pg")
    val l1 = """2023-09-20 16:50:02.165 CET,,,407764,,650b069a.638d4,2,,2023-09-20 16:50:02 CET,,0,DEBUG3,00000,"starting PostgreSQL 15.4 (Ubuntu 15.4-0ubuntu0.23.04.1) on x86_64-pc-linux-gnu, compiled by gcc (Ubuntu 12.3.0-1ubuntu1~23.04) 12.3.0, 64-bit",,,,,,,,,"","postmaster",,0"""
    val l2 = """2023-08-08 12:05:52.805 UTC,,,22113,,64d22fa0.5661,1,,2023-08-08 12:05:52 UTC,23/74060,0,LOG,00000,"automatic vacuum of table ""tablename"": index scans: 0",,,,,,,,,"""""
    java.nio.file.Files.write(dir.resolve("in.csv"), (l1 + "\n" + l2).getBytes("UTF-8"))
    // scl/pgsql/pgsql.conf's parser block: the csv-parser column list is
    // verbatim (typed int() wrappers included), the date-parser extracts
    // the zone-less prefix via $(substr), and the PID/MESSAGE promotion
    // rewrites ride as a rewrite block (the severity-shift ladder needs
    // pgsql's nonstandard level names and is not ported)
    val cfg = s"""
      block parser postgresql-csvlog-parser(prefix('pg_')) {
        csv-parser(columns('timestamp', 'username', 'database', int('pid'),
                           'connection_from', 'session_id', int('session_line_num'),
                           'command_tag', 'session_start_time', 'virtual_transaction_id',
                           int('transaction_id'), 'severity', 'sql_state_code',
                           'message', 'detail', 'hint', 'internal_query',
                           int('internal_query_pos'), 'context', 'query',
                           int('query_pos'), 'location', 'application_name',
                           'backend_type', int('leader_pid'), int('query_id'))
                   delimiters(',') dialect(escape-double-char)
                   flags(strip-whitespace) prefix(`prefix`) quote-pairs('""'));
        date-parser(format('%Y-%m-%d %H:%M:%S.%f')
                    template('$$(substr $${pg_timestamp} 0 23)'));
      };
      source s { file("$dir/*.csv" format(text)); };
      parser p { postgresql-csvlog-parser(); };
      rewrite r { set("$${pg_message}" value("msg")); };
      destination d { file("out"); };
      log { source(s); parser(p); rewrite(r); destination(d); };
    """
    val out = ConfigText.compile(spark, cfg).sink("out")
    assert(out.count() === 2)
    val r1 = out.where(col("pg_pid") === 407764L)
      .select("pg_session_id", "pg_session_line_num", "pg_severity",
        "pg_backend_type", "pg_query_id", "msg", "ts").head()
    assert(r1.getString(0) === "650b069a.638d4" && r1.getLong(1) === 2L)
    assert(r1.getString(2) === "DEBUG3" && r1.getString(3) === "postmaster")
    assert(r1.getLong(4) === 0L)
    assert(r1.getString(5).startsWith("starting PostgreSQL 15.4") &&
      r1.getString(5).endsWith("12.3.0, 64-bit")) // comma inside quotes kept
    assert(r1.getAs[java.time.LocalDateTime](6)
      === java.time.LocalDateTime.parse("2023-09-20T16:50:02.165"))
    // doubled quotes unescape; pre-v13 line (24 cols) partial-fills
    val r2 = out.where(col("pg_pid") === 22113L)
      .select("msg", "pg_severity", "pg_backend_type").head()
    assert(r2.getString(0) === "automatic vacuum of table \"tablename\": index scans: 0")
    assert(r2.getString(1) === "LOG" && r2.getString(2) === null)
  }

  test("panos SCL: two-pass csv with type dispatch (scl/paloalto/panos.conf, " +
      "light test_panos_parser.py samples)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pan")
    val lines = Seq(
      // SYSTEM
      """<12>Apr 14 16:48:54 paloalto.test.net 1,2020/04/14 16:48:54,unknown,SYSTEM,auth,0,2020/04/14 16:48:54,,auth-fail,,0,0,general,medium,failed authentication for user 'admin'. Reason: Invalid username/password. From: 10.0.10.55.,1718,0x0,0,0,0,0,,paloalto""",
      // SYSTEM with trailing extras — must still be accepted
      """<12>Apr 14 16:48:54 paloalto.test.net 1,2020/04/14 16:48:54,unknown,SYSTEM,auth,0,2020/04/14 16:48:54,,auth-fail,,0,0,general,medium,failed authentication for user 'admin'. Reason: Invalid username/password. From: 10.0.10.55.,1718,0x0,0,0,0,0,,paloalto,foo,bar""",
      // CONFIG (non-custom format)
      """<14>Apr 14 16:54:18 paloalto.test.net 1,2020/04/14 16:54:18,unknown,CONFIG,0,0,2020/04/14 16:54:18,10.0.10.55,,set,admin,Web,Succeeded,deviceconfig system,127,0x0,0,0,0,0,,paloalto""")
    java.nio.file.Files.write(dir.resolve("in.log"), lines.mkString("\n").getBytes("UTF-8"))
    // scl/paloalto/panos.conf flattened: pass 1 splits the common fields
    // with a greedy `tmp` tail; the type field dispatches pass 2 over
    // ${pan_tmp} (the reference glues ${LEGACY_MSGHDR}${MESSAGE} back for
    // the same reason the first greedy column here absorbs the syslog
    // header: PAN-OS messages are headerless CSV)
    val cfg = s"""
      block parser panos-parser(prefix('pan_')) {
        csv-parser(columns('future_use1', 'receive_time', 'serial', 'type',
                           'subtype', 'future_use2', 'time_generated', 'tmp')
                   delimiters(',') flags(greedy, drop-invalid) prefix(`prefix`));
      };
      source s { file("$dir/*.log" format(text)); };
      parser p0 { panos-parser(); };
      parser p_system {
        csv-parser(columns('vsys', 'eventid', 'object', 'future_use3', 'future_use4',
                           'module', 'severity', 'opaque', 'seqno', 'actionflags',
                           'dg_hier_level_1', 'dg_hier_level_2', 'dg_hier_level_3',
                           'dg_hier_level_4', 'vsys_name', 'device_name')
                   prefix('pan_') template("$${pan_tmp}") delimiters(','));
      };
      parser p_config {
        csv-parser(columns('host', 'vsys', 'cmd', 'admin', 'client', 'result', 'path',
                           'seqno', 'actionflags', 'dg_hier_level_1', 'dg_hier_level_2',
                           'dg_hier_level_3', 'dg_hier_level_4', 'vsys_name', 'device_name')
                   prefix('pan_') template("$${pan_tmp}") delimiters(','));
      };
      destination d { file("out"); };
      log { source(s); parser(p0);
            if (match('SYSTEM' value('pan_type') type(string))) { parser(p_system); }
            elif (match('CONFIG' value('pan_type') type(string))) { parser(p_config); };
            destination(d); };
    """
    val out = ConfigText.compile(spark, cfg).sink("out")
    assert(out.count() === 3)
    val sys0 = out.where(col("pan_type") === "SYSTEM")
      .select("pan_eventid", "pan_module", "pan_severity", "pan_device_name")
      .collect()
    assert(sys0.length === 2)
    sys0.foreach { r =>
      assert(r.toSeq === Seq("auth-fail", "general", "medium", "paloalto"))
    }
    val cfg0 = out.where(col("pan_type") === "CONFIG")
      .select("pan_host", "pan_cmd", "pan_admin", "pan_client", "pan_result",
        "pan_path", "pan_device_name").head()
    assert(cfg0.toSeq === Seq("10.0.10.55", "set", "admin", "Web", "Succeeded",
      "deviceconfig system", "paloalto"))
  }

  test("sdata-parser(): unquoted SDATA parses, $SDATA re-renders quoted (test_sdata_parser.py)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sd")
    java.nio.file.Files.write(dir.resolve("in.log"),
      "[Originator@6876 sub=Vimsvc.ha-eventmgr opID=esxui-13c6-6b16 sid=5214bde6 user=root]"
        .getBytes("UTF-8"))
    val cfg = s"""
      source s { file("$dir/*.log" format(text)); };
      parser p { sdata-parser(); };
      rewrite r { set("$$SDATA" value("rendered")); };
      destination d { file("out"); };
      log { source(s); parser(p); rewrite(r); destination(d); };
    """
    val got = ConfigText.compile(spark, cfg).sink("out")
      .select("rendered").as[String].head()
    assert(got ===
      """[Originator@6876 sub="Vimsvc.ha-eventmgr" opID="esxui-13c6-6b16" sid="5214bde6" user="root"]""")
  }

  test("named log paths: route ingress/egress counters (test_named_logpaths.py)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-np")
    java.nio.file.Files.write(dir.resolve("in.log"), Seq(
      "to-top-level-2", "to-top-level-3", "to-inner-1", "to-inner-2", "to-inner-3")
      .mkString("\n").getBytes("UTF-8"))
    val cfg = s"""
      source s { file("$dir/*.log" format(text)); };
      filter f_t2 { message("to-top-level-2"); };
      filter f_t3 { message("to-top-level-3"); };
      filter f_i1 { message("to-inner-1"); };
      filter f_i2 { message("to-inner-2"); };
      filter f_i3 { message("to-inner-3"); };
      destination d_1 { file("d1"); };
      destination d_2 { file("d2"); };
      log top-level-1 { source(s); };
      log top-level-2 { source(s); filter(f_t2); destination(d_1); };
      log top-level-3 { source(s); filter(f_t3); destination(d_1); destination(d_2); };
      log top-level-4 { source(s);
        log inner-1 { filter(f_i1); destination(d_1); };
        log inner-2 { filter(f_i2); destination(d_2); };
      };
      log top-level-5 { source(s); destination(d_1);
        log inner-3 { filter(f_i3); destination(d_2); };
      };
    """
    val c = ConfigText.compile(spark, cfg)
    val stats = c.routeStats.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // every named path sees all 5 rows; egress counts rows matched through
    // the WHOLE path (a d_1 write in top-level-5 does not make egress —
    // the trailing inner-3 filter must also match)
    assert(stats("top-level-1") === ((5L, 5L)))
    assert(stats("top-level-2") === ((5L, 1L)))
    assert(stats("top-level-3") === ((5L, 1L)))
    assert(stats("top-level-4") === ((5L, 2L))) // inner-1 ∨ inner-2 matched
    assert(stats("inner-1") === ((5L, 1L)))
    assert(stats("inner-2") === ((5L, 1L)))
    assert(stats("top-level-5") === ((5L, 1L))) // only to-inner-3
    assert(stats("inner-3") === ((5L, 1L)))
    // routing itself unchanged: d_1 gets t2, t3, inner-1, and ALL rows via
    // the unconditional top-level-5 destination
    assert(c.sink("d1").count() === 5)
    assert(c.sink("d2").count() === 3) // t3, inner-2, inner-3
    val prom = c.routeStatsPrometheus
    assert(prom.contains("""syslogng_route_ingress_total{id="top-level-4"} 5"""))
    assert(prom.contains("""syslogng_route_egress_total{id="top-level-4"} 2"""))
  }

  test("condition() guards on rewrite rules (rewrite-expr.c): only matching rows change") {
    val cfg = s"""
      source s { transcripts("$sfUnit"); };
      rewrite r {
        set("T" value("mark") condition(match("^tool$$" value("role"))));
        set-tag("long" condition("$${turn_idx}" >= "5"));
      };
      destination d { file("out"); };
      log { source(s); rewrite(r); destination(d); };
    """
    val c = ConfigText.compile(spark, cfg)
    val out = c.sink("out")
    val t = graft.transcripts.Transcripts.loadFull(spark, sfUnit)
    assert(out.where(col("mark") === "T").count() ===
      t.where(col("role") === "tool").count())
    assert(out.where(col("mark").isNotNull && col("role") =!= "tool").count() === 0)
    assert(out.where(array_contains(col("tags"), "long")).count() ===
      t.where(col("turn_idx") >= 5).count())
  }

  test("cc-mask SCL: block chain + store-matches subst template masks card numbers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc")
    java.nio.file.Files.write(dir.resolve("pay.log"), Seq(
      "visa charge 4111111111111111 approved",
      "amex charge 378282246310005 approved",
      "no card in this line").mkString("\n").getBytes("UTF-8"))
    // the reference's scl/rewrite/cc-mask.conf block chain, visa+amex arms
    val cfg = s"""
      block rewrite credit-card-internal(regex() value() template()) {
        subst("`regex`" "`template`" value(`value`)
              flags(global, store-matches) type(pcre));
      };
      block rewrite credit-card-visa(value() template()) {
        credit-card-internal(regex("(?:4[0-9]{12}(?:[0-9]{3})?)")
                             value(`value`) template(`template`));
      };
      block rewrite credit-card-american_express(value() template()) {
        credit-card-internal(regex("(3[47][0-9]{13})")
                             value(`value`) template(`template`));
      };
      block rewrite credit-card-mask(value("MESSAGE")
          template("$$(substr $$0 0 6)******$$(substr $$0 -4 4)")) {
        credit-card-visa(value(`value`) template("`template`"));
        credit-card-american_express(value(`value`) template("`template`"));
      };
      source s { file("$dir/*.log" format(text)); };
      rewrite r_mask { credit-card-mask(); };
      destination d { file("masked"); };
      log { source(s); rewrite(r_mask); destination(d); };
    """
    val got = ConfigText.compile(spark, cfg).sink("masked")
      .orderBy("text").select("text").as[String].collect().toSeq
    assert(got == Seq(
      "amex charge 378282******0005 approved",
      "no card in this line",
      "visa charge 411111******1111 approved"))
  }
}
