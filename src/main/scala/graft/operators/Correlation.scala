package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's stateful/correlation operators (its only aggregations —
  * reference modules/correlation/) re-expressed Spark-first for batch; the
  * streaming variants live in graft.streaming.
  *
  * State in the reference is keyed by CorrelationKey (scope + templated key,
  * reference modules/correlation/correlation-key.h:28-59) and expired by an
  * event-time timer wheel (modules/correlation/timerwheel.c, advanced by
  * message timestamps — grouping-parser.c:80-127). The batch equivalents are
  * `session_window` (event-time gap sessions ≡ timeout() expiry) and window
  * functions over a deterministic `(ts, turn_idx)` order.
  */
object Correlation {

  /** grouping-by(key(), timeout(), aggregate(), having()) — reference
    * modules/correlation/groupingby.c:116. Batch shape: event-time session
    * windows per key; `timeout()` is the session gap; `having()` is a
    * post-aggregation filter (groupingby.c:94-99); `aggregate()` templates
    * become agg Columns over the context (count/collect/first — the
    * $(context-*) template function family).
    *
    * Scale: one hash-shuffle on the key; sessionization is a sort within
    * each key partition — no cross-key state, so it scales linearly with
    * executors. A HOT key still lands on one task (AQE skew splitting
    * applies to sort-merge joins, not window sorts or session aggs) — for
    * skewed key domains use Skew.saltedSessionize, which is row-identical
    * with order-aligned slicing.
    */
  def groupingBy(
      df: DataFrame,
      keys: Seq[Column],
      ts: Column,
      timeout: String,
      aggs: Seq[Column],
      having: Option[Column] = None): DataFrame = {
    val sw = session_window(ts, timeout)
    val grouped = df
      .groupBy((sw +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
    having.fold(grouped)(grouped.filter)
  }

  /** grouping-by() with a TRIGGER — `trigger("$(context-length)" == "N")`
    * closes the context every N messages, independent of the timeout
    * (reference modules/correlation/tests/test_grouping_by.c:65-150 +
    * grouping-by.c trigger evaluation on each arrival). Batch shape:
    * gap-based sessions via a running sum of timeout breaks, then fixed
    * N-blocks within each session — two window passes over ONE keyed
    * sort (both windows share the partitioning, so a single shuffle),
    * then the usual hash aggregate. `injectPassThrough` unions the
    * original rows under the aggregates (inject-mode(pass-through));
    * default is aggregate-only.
    */
  def groupingByTriggered(
      df: DataFrame,
      keys: Seq[Column],
      ts: Column,
      timeoutSeconds: Long,
      triggerCount: Int,
      aggs: Seq[Column],
      injectPassThrough: Boolean = false,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = ts +: tieBreak
    val w = Window.partitionBy(keys: _*).orderBy(ord: _*)
    val tsSec = ts.cast("long")
    val gap = tsSec - lag(tsSec, 1).over(w)
    val sessioned = df
      .withColumn("__brk", when(gap.isNull || gap > timeoutSeconds, 1L).otherwise(0L))
      .withColumn("__sess", sum(col("__brk")).over(w))
    val wIn = Window.partitionBy((keys :+ col("__sess")): _*).orderBy(ord: _*)
    val blocked = sessioned
      .withColumn("__ctx", floor((row_number().over(wIn) - 1) / triggerCount))
    val grouped = blocked
      .groupBy((keys :+ col("__sess") :+ col("__ctx")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .drop("__sess", "__ctx")
    if (!injectPassThrough) grouped
    else grouped.unionByName(df, allowMissingColumns = true)
  }

  /** rate-limit(key(), rate()) — reference modules/rate-limit-filter/
    * rate-limit.c:68-142. The reference is a wall-clock token bucket (1s
    * refill); arrival order is nondeterministic there. The batch semantics
    * (documented delta, SURVEY.md §7.3): within each (key, time-bucket) the
    * first `rate` rows in deterministic `(ts, tieBreak...)` order pass.
    */
  def rateLimit(
      df: DataFrame,
      keys: Seq[Column],
      ts: Column,
      bucket: String,
      rate: Int,
      tieBreak: Seq[Column]): DataFrame = {
    val w = Window
      .partitionBy((date_trunc(bucket, ts) +: keys): _*)
      .orderBy((ts +: tieBreak).map(_.asc): _*)
    df.withColumn("rl_rn", row_number().over(w))
      .filter(col("rl_rn") <= rate)
      .drop("rl_rn")
  }

  /** patterndb action rate(N/quantum) — the token bucket gating rule
    * actions (reference modules/correlation/patterndb.c:173-230
    * `_is_action_within_rate_limit`, state struct pdb-ratelimit.h:31-38),
    * keyed by the correlation scope key (here `keys`, which callers build
    * as rule_id:action_id × scope columns, patterndb.c:188-189).
    *
    * Exact reference arithmetic, driven by event time (the reference's
    * pseudo-time is message timestamps, correlation_state_get_time):
    * the bucket starts FULL (`rate` tokens, patterndb.c:204-208); refill
    * credits use 8-bit fixed point `(Δ<<8) / ((quantum<<8)/rate)`
    * (patterndb.c:212) and `last_check` advances only when ≥1 credit
    * lands (216-222); each passed action consumes one token (224-228).
    * The fixed-point denominator underflows to zero when rate >
    * 256·quantum (the reference would divide by zero there) — clamped
    * to 1.
    *
    * Batch shape: one shuffle on `keys`, per-key sort + linear fold (an
    * `aggregate` HOF over the collected event list — per-key state is a
    * 3-field struct, never a driver loop), then a semi join returns the
    * passing rows. `tieBreak` must be unique within a key (it is the
    * deterministic processing order AND the join-back identity).
    */
  def actionRateLimit(
      df: DataFrame,
      keys: Seq[Column],
      ts: Column,
      rate: Int,
      quantumSeconds: Int,
      tieBreak: Seq[Column]): DataFrame = {
    require(rate > 0 && quantumSeconds > 0, "rate(N/quantum) needs N>0, quantum>0")
    require(tieBreak.nonEmpty, "actionRateLimit needs a deterministic tieBreak")
    val den = math.max(1L, (quantumSeconds.toLong << 8) / rate)
    val keyNames = keys.indices.map(i => s"__arl_k$i")
    val tbNames = tieBreak.indices.map(i => s"__arl_b$i")
    val base = df
      .withColumn("__arl_t", unix_timestamp(ts))
      .withColumns(keyNames.zip(keys).toMap)
      .withColumns(tbNames.zip(tieBreak).toMap)
    val ev = struct((col("__arl_t").as("t") +: tbNames.map(col)): _*)
    val rl = lit(rate.toLong)
    val passes = base.groupBy(keyNames.map(col): _*)
      .agg(array_sort(collect_list(ev)).as("evs"))
      .withColumn("state", aggregate(
        col("evs"),
        struct(rl.as("b"), lit(null).cast("long").as("last"),
          slice(col("evs"), 1, 0).as("pass")), // empty array, element-typed
        (acc, x) => {
          val credits = ((x("t") - acc("last")) * 256).divide(lit(den)).cast("long")
          val refilled = when(acc("last").isNull, rl)
            .when(credits > 0, least(acc("b") + credits, rl))
            .otherwise(acc("b"))
          struct(
            (refilled - when(refilled > 0, 1L).otherwise(0L)).as("b"),
            when(acc("last").isNull || credits > 0, x("t"))
              .otherwise(acc("last")).as("last"),
            when(refilled > 0, array_append(acc("pass"), x))
              .otherwise(acc("pass")).as("pass"))
        }))
      .select((keyNames.map(col) :+ explode(col("state.pass")).as("__arl_e")): _*)
      .select((keyNames.map(col) :+ col("__arl_e.t").as("__arl_t")) ++
        tbNames.map(n => col(s"__arl_e.$n").as(n)): _*)
    base.join(passes, (keyNames :+ "__arl_t") ++ tbNames, "left_semi")
      .drop(((keyNames :+ "__arl_t") ++ tbNames): _*)
  }

  /** suppress(seconds) — duplicate elision in the writer (reference
    * lib/logwriter.c suppress logic): a message identical to the previous
    * one on the same key within the interval is suppressed; the survivor
    * carries `repeated` = number of suppressed duplicates that followed it
    * (the reference's "last message repeated N times" synthetic line).
    *
    * Batch shape: lag() over a per-key event-time order marks suppressed
    * rows; a run-id (sum of keep-markers) groups each survivor with its
    * duplicates — two window passes, one shuffle on the key.
    */
  def suppress(
      df: DataFrame,
      key: Seq[Column],
      dupKey: Column,
      ts: Column,
      intervalSeconds: Long,
      tieBreak: Seq[Column]): DataFrame = {
    val order = (ts +: tieBreak).map(_.asc)
    val w = Window.partitionBy(key: _*).orderBy(order: _*)
    val prevDup = lag(dupKey, 1).over(w)
    val prevTs = lag(ts, 1).over(w)
    val keep = prevDup.isNull || prevDup =!= dupKey ||
      unix_timestamp(ts) - unix_timestamp(prevTs) > intervalSeconds
    val marked = df
      .withColumn("sup_keep", keep)
      .withColumn("sup_run", sum(when(col("sup_keep"), 1).otherwise(0)).over(w))
    val runW = Window.partitionBy((col("sup_run") +: key): _*)
    marked
      .withColumn("repeated", count(lit(1)).over(runW) - 1)
      .filter(col("sup_keep"))
      .drop("sup_keep", "sup_run")
  }

  /** metrics-probe(key(), labels(), increment()) — reference
    * modules/metrics-probe/metrics-probe.c:93-106: per-message counters
    * keyed by evaluated label templates. Batch: one hash aggregate emitting
    * stats-table rows (stage, labels..., count, sum-of-increment) — partial
    * (map-side) aggregation makes this a near-free pass at any scale.
    */
  def metricsProbe(
      df: DataFrame,
      stage: String,
      labels: Map[String, Column],
      increment: Column = lit(1L)): DataFrame = {
    val labelCols = labels.toSeq.sortBy(_._1)
    df.groupBy(labelCols.map { case (n, c) => c.as(n) }: _*)
      .agg(count(lit(1)).as("n_msgs"), sum(increment).as("value"))
      .withColumn("stage", lit(stage))
  }

  /** Multi-line reassembly (reference group-lines() multi-line FSM modes,
    * modules/correlation/group-lines.c:166 + lib/multi-line/): a new block
    * starts at every row matching `isStart`; following rows (continuation
    * lines — the "indented"/"prefix-suffix" modes reduce to this predicate)
    * append to it. Gaps-and-islands: running count of starts = block id,
    * then ordered concatenation per (key, block). Rows before the first
    * start form block 0 (the reference flushes them as-is).
    */
  def multiLine(
      df: DataFrame,
      key: Column,
      order: Column,
      text: Column,
      isStart: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order.asc)
    df.withColumn("block", sum(when(isStart, 1).otherwise(0)).over(w))
      .groupBy(key.as("key"), col("block"))
      .agg(Correlation.blockAggs(order, text).head,
        Correlation.blockAggs(order, text).tail: _*)
  }

  /** patterndb rule actions: a synthetic message per closed correlation
    * context (reference modules/correlation/synthetic-message.c, inherit
    * modes synthetic-message.h:32-34). One row per (key, session):
    * `values` are template aggregates over the context; inherited columns
    * come from the context per `inheritMode` —
    *  - "none": nothing inherited,
    *  - "last-message": the closing message's values,
    *  - "context": the union of context values (for flat columns: the last
    *    NON-NULL value in context order — the reference's dynamic-value
    *    union collapsed onto a fixed schema).
    * Deterministic: both modes use max_by over (ts, order), never last().
    */
  def syntheticMessages(
      df: DataFrame,
      keys: Seq[Column],
      ts: Column,
      timeout: String,
      order: Column,
      inheritMode: String,
      inheritCols: Seq[String],
      values: Seq[Column]): DataFrame = {
    val ord = struct(ts, order)
    val inherited = inheritMode match {
      case "none" => Nil
      case "last-message" =>
        inheritCols.map(c => max_by(col(c), ord).as(c))
      case "context" =>
        inheritCols.map(c =>
          max_by(col(c), when(col(c).isNotNull, ord)).as(c))
      case other => sys.error(s"unknown inherit mode: $other")
    }
    groupingBy(df, keys, ts, timeout, values ++ inherited)
  }

  /** group-lines() FSM modes (reference lib/multi-line/multi-line-factory.h:
    * 33-38 MLM_*): how lines aggregate into messages. Batch reduction of
    * each accumulate_line FSM (lines are rows; REWIND ≡ "this row starts a
    * new block", EXTRACTED-at-garbage ≡ "previous row closed the block").
    */
  sealed trait MultiLineMode
  /** explicit start predicate (the generic reduction multiLine uses). */
  final case class StartPredicate(isStart: Column) extends MultiLineMode
  /** continuation lines start with space/tab
    * (lib/multi-line/indented-multi-line.c:29). */
  case object Indented extends MultiLineMode
  /** messages start at prefix; garbage-matching lines close and are
    * discarded (lib/multi-line/regexp-multi-line.c:57-66). */
  final case class PrefixGarbage(prefix: String, garbage: String) extends MultiLineMode
  /** messages start at prefix and close AFTER a suffix-matching line,
    * which is included (regexp-multi-line.c:38-44 consumes to suffix end). */
  final case class PrefixSuffix(prefix: String, suffix: String) extends MultiLineMode
  /** the full multi-language backtrace FSM, table-driven from the shipped
    * smart-multi-line.fsm (Java/Python/PHP/Go/Ruby/Dart/JS) — see
    * [[SmartMultiLine]]. */
  case object Smart extends MultiLineMode

  /** Multi-line reassembly with a mode (the full group-lines surface).
    * Same output shape as [[multiLine]]; PrefixGarbage drops its garbage
    * rows from the block content like the reference discards garbage.
    */
  def groupLines(
      df: DataFrame,
      key: Column,
      order: Column,
      text: Column,
      mode: MultiLineMode): DataFrame = {
    mode match {
      case Smart =>
        // sequential FSM classification: the block ordinal comes out of
        // the per-partition scan, so the block assembly needs no window
        return SmartMultiLine.annotateStarts(df, key, order, text)
          .groupBy(key.as("key"), col("__sml_block").as("block"))
          .agg(Correlation.blockAggs(order, text).head,
            Correlation.blockAggs(order, text).tail: _*)
      case _ => ()
    }
    val w = Window.partitionBy(key).orderBy(order.asc)
    val prev = lag(text, 1).over(w)
    val (isStart, excluded) = mode match {
      case StartPredicate(s) => (s, lit(false))
      case Indented          => (!text.rlike("^[ \t]"), lit(false))
      case PrefixGarbage(p, g) =>
        (text.rlike(p) || prev.isNull || prev.rlike(g), text.rlike(g))
      case PrefixSuffix(p, sfx) =>
        (text.rlike(p) || prev.isNull || prev.rlike(sfx), lit(false))
      case Smart => sys.error("unreachable")
    }
    df.withColumn("__ml_ex", excluded)
      .withColumn("block", sum(when(isStart, 1).otherwise(0)).over(w))
      .filter(!col("__ml_ex"))
      .groupBy(key.as("key"), col("block"))
      .agg(Correlation.blockAggs(order, text).head,
        Correlation.blockAggs(order, text).tail: _*)
  }

  /** The ordered-block output aggregate shared by every multi-line shape
    * (and Skew.saltedMultiLine — the salted/unsalted row-identity contract
    * is structural, not copy-paste): line count, first order value, and
    * the order-sorted newline join.
    */
  private[graft] def blockAggs(order: Column, text: Column): Seq[Column] = Seq(
    count(lit(1)).as("n_lines"),
    min(order).as("start_idx"),
    concat_ws("\n",
      transform(array_sort(collect_list(struct(order.as("o"), text.as("t")))),
        x => x("t"))).as("joined"))

  /** The context-scoped template functions (reference
    * modules/basicfuncs/basic-funcs.c:81-83 `$(context-length)`,
    * `$(context-lookup)`, `$(context-values)`, `$(grep)` — evaluated over a
    * whole CorrelationContext, reference lib/template/eval.c:126-244 with
    * num_msg > 1): aggregate Columns to use inside a grouping-by `agg`.
    */
  object Context {
    /** $(context-length) — number of messages in the context. */
    def length: Column = count(lit(1))

    /** $(context-values $x) — every value of x in the context, ordered. */
    def values(value: Column, order: Column): Column =
      transform(array_sort(collect_list(struct(order.as("o"), value.as("v")))), x => x("v"))

    /** $(context-lookup filter $x) / $(grep cond $x) — values of x from
      * context messages matching the condition, in context order
      * (collect_list alone is partition-order nondeterministic — the same
      * reason values() takes an order ref; stage retries must re-produce
      * identical arrays).
      */
    def lookup(cond: Column, value: Column, order: Column): Column =
      transform(
        array_sort(collect_list(when(cond, struct(order.as("o"), value.as("v"))))),
        x => x("v"))

    def grep(cond: Column, value: Column, order: Column): Column =
      lookup(cond, value, order)
  }

  /** logscheduler(partitions(N)) — reference lib/logscheduler.c:62-112
    * load-balances re-injected messages across N partitions while keeping
    * per-key order: `repartition(N, key)` is exactly that contract.
    */
  def schedule(df: DataFrame, numPartitions: Int, keys: Column*): DataFrame =
    if (keys.isEmpty) df.repartition(numPartitions)
    else df.repartition(numPartitions, keys: _*)
}
