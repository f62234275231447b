package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Skew handling (north rule): salted two-phase aggregation must be
  * row-identical to the direct aggregate, with the hot key's work spread
  * over many reducers; custom SQL functions register via GraftExtensions.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hot key: one conv with 5000 turns, 50 normal convs with 10
  private lazy val skewed = {
    val hot = (0 until 5000).map(i => ("conv-hot", i, s"line $i"))
    val normal = for (c <- 0 until 50; i <- 0 until 10)
      yield (s"conv-$c", i, s"c$c line $i")
    (hot ++ normal).toDF("conv_id", "turn_idx", "text")
  }

  test("salted count == direct count; hot key spread over salts") {
    val s = Skew.salt(8, col("turn_idx"))
    val salted = Skew.saltedCount(skewed, col("conv_id"), s)
      .as[(String, Long)].collect().toMap
    val direct = skewed.groupBy("conv_id").count().as[(String, Long)].collect().toMap
    assert(salted === direct)
    // phase-1 cardinality proves the hot key really split
    val phase1 = skewed.groupBy(col("conv_id"), s.as("salt")).count()
      .filter(col("conv_id") === "conv-hot").count()
    assert(phase1 === 8)
  }

  test("salted group-lines == direct ordered reassembly") {
    val direct = skewed.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("turn_idx"), col("text")))),
            x => x("text"))).as("joined"))
      .as[(String, Long, String)].collect().sortBy(_._1)
    val salted = Skew.saltedGroupLines(
      skewed, col("conv_id"), col("turn_idx"), col("text"), sliceSize = 100)
      .as[(String, Long, String)].collect().sortBy(_._1)
    assert(salted === direct)
  }

  // skewed frame with event times + dup keys for the windowed operators
  private lazy val timed = {
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(m: Long) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val hot = (0 until 3000).map(i =>
      ("conv-hot", i, ts(i * 7L), s"act-${(i / 13) % 5}", if (i % 11 == 0) "user" else "tool"))
    val normal = for (c <- 0 until 30; i <- 0 until 12)
      yield (s"conv-$c", i, ts(c * 500L + i * 3L), s"act-${i % 3}", if (i % 4 == 0) "user" else "tool")
    (hot ++ normal).toDF("conv_id", "turn_idx", "ts", "action", "role")
  }

  test("salted multiLine == direct (hot key, blocks spanning slices)") {
    import graft.operators.Correlation
    val direct = Correlation.multiLine(skewed, col("conv_id"), col("turn_idx"),
      col("text"), isStart = col("turn_idx") % 7 === 0)
      .as[(String, Long, Long, Int, String)].collect().sortBy(r => (r._1, r._2))
    val salted = Skew.saltedMultiLine(skewed, col("conv_id"), col("turn_idx"),
      col("text"), isStart = col("turn_idx") % 7 === 0, sliceSize = 100)
      .as[(String, Long, Long, Int, String)].collect().sortBy(r => (r._1, r._2))
    assert(salted === direct)
  }

  test("salted suppress == direct (boundary rows recovered across slices)") {
    import graft.operators.Correlation
    val direct = Correlation.suppress(timed, Seq(col("conv_id")), col("action"),
      col("ts"), intervalSeconds = 3600L, tieBreak = Seq(col("turn_idx")))
      .select("conv_id", "turn_idx", "repeated")
      .as[(String, Int, Long)].collect().sortBy(r => (r._1, r._2))
    val salted = Skew.saltedSuppress(timed, Seq(col("conv_id")), col("action"),
      col("ts"), intervalSeconds = 3600L, tieBreak = Seq(col("turn_idx")),
      sliceSeconds = 7200L)
      .select("conv_id", "turn_idx", "repeated")
      .as[(String, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(salted === direct)
  }

  test("salted sessionize == session_window grouping (sessions spanning slices)") {
    import graft.operators.Correlation
    val aggs = Seq(count(lit(1)).as("n_turns"),
      sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"))
    val direct = Correlation.groupingBy(timed, Seq(col("conv_id")), col("ts"),
      timeout = "30 minutes", aggs = aggs)
      .select("conv_id", "n_turns", "n_user", "session_start", "session_end")
      .as[(String, Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(r => (r._1, r._4.getTime))
    val salted = Skew.saltedSessionize(timed, Seq(col("conv_id")), col("ts"),
      timeoutSeconds = 1800L, aggs = aggs, sliceSeconds = 3600L)
      .select("conv_id", "n_turns", "n_user", "session_start", "session_end")
      .as[(String, Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(r => (r._1, r._4.getTime))
    assert(salted === direct)
  }

  test("salted trigger blocks == direct groupingByTriggered (blocks spanning slices)") {
    import graft.operators.Correlation
    val aggs = Seq(count(lit(1)).as("n_turns"),
      min(col("turn_idx")).as("first_turn"),
      sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"))
    // timeout 30 min, trigger every 4 messages; the hot conv's 7-min cadence
    // never gaps, so it is ONE session whose blocks must span hour slices
    val direct = Correlation.groupingByTriggered(timed, Seq(col("conv_id")),
      col("ts"), timeoutSeconds = 1800L, triggerCount = 4, aggs = aggs,
      tieBreak = Seq(col("turn_idx")))
      .as[(String, Long, Int, Long)].collect().sortBy(r => (r._1, r._3))
    val salted = Skew.saltedGroupingByTriggered(timed, Seq(col("conv_id")),
      col("ts"), timeoutSeconds = 1800L, triggerCount = 4, aggs = aggs,
      tieBreak = Seq(col("turn_idx")), sliceSeconds = 3600L)
    val got = salted.as[(String, Long, Int, Long)].collect().sortBy(r => (r._1, r._3))
    assert(got === direct)
    // plan assertion: no full-row window partitions by the bare key — every
    // window either adds a slice/session discriminator or runs over the
    // slice-level offset frame (whose input is one row per (key, slice))
    val windows = salted.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      // every window either carries a slice/session discriminator next to
      // the key (full-row windows), or is a cross-slice offset scan ordered
      // by slice over the aggregated one-row-per-(key,slice) frame
      val slicePartitioned = w.partitionSpec.size >= 2
      val sliceLevelOffsetScan =
        w.orderSpec.exists(_.child.toString.contains("__sk_slice"))
      assert(slicePartitioned || sliceLevelOffsetScan,
        s"window spans a whole key: partition=${w.partitionSpec} order=${w.orderSpec}")
    }
    // inject-mode(pass-through) unions the originals under the aggregates
    val injected = Skew.saltedGroupingByTriggered(timed, Seq(col("conv_id")),
      col("ts"), timeoutSeconds = 1800L, triggerCount = 4, aggs = aggs,
      injectPassThrough = true, tieBreak = Seq(col("turn_idx")),
      sliceSeconds = 3600L)
    assert(injected.count() === direct.length + timed.count())
  }

  test("deterministic salt: same rows → same salt on recompute (no rand())") {
    val s1 = skewed.select(Skew.salt(16, col("conv_id"), col("turn_idx"))).as[Int].collect()
    val s2 = skewed.select(Skew.salt(16, col("conv_id"), col("turn_idx"))).as[Int].collect()
    assert(s1.toSeq === s2.toSeq)
    assert(s1.distinct.length > 1)
  }

  test("GraftExtensions: custom expressions callable from SQL") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT regexp_replace_first('a1b2', '\\\\d', 'X') AS v")
      .as[String].head()
    assert(got === "aXb2")
  }

  test("equal-gap events merge in both session paths (boundary semantics)") {
    import graft.operators.Correlation
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def t(m: Long) = new java.sql.Timestamp(base.getTime + m * 60000L)
    // gaps of exactly 30 min with a 30-minute timeout: session_window
    // merges them; the salted marker (gap > timeout) must agree
    val df = Seq(("c", 0, t(0)), ("c", 1, t(30)), ("c", 2, t(60)), ("c", 3, t(121)))
      .toDF("conv_id", "i", "ts")
    val aggs = Seq(count(lit(1)).as("n"))
    val direct = Correlation.groupingBy(df, Seq(col("conv_id")), col("ts"),
      "30 minutes", aggs).select("n").as[Long].collect().sorted
    val salted = Skew.saltedSessionize(df, Seq(col("conv_id")), col("ts"),
      1800L, aggs, sliceSeconds = 3600L).select("n").as[Long].collect().sorted
    assert(direct.toSeq === Seq(1L, 3L)) // equal-gap rows merged
    assert(salted.toSeq === direct.toSeq)
  }

  test("profile: hot key tops the list with the right share and salt recommendation") {
    val prof = Skew.profile(skewed, col("conv_id"), topK = 5,
        targetRowsPerTask = 1000L)
      .as[(String, Long, Double, Int)].collect()
    assert(prof.length === 5)
    val (k, n, share, salts) = prof.head
    assert(k === "conv-hot" && n === 5000L)
    assert(math.abs(share - 5000.0 / 5500.0) < 1e-12)
    assert(salts === 5, "ceil(5000/1000) tasks for the hot key")
    // cold keys: 10 rows → 1 salt, i.e. no salting needed
    assert(prof.tail.forall { case (_, cn, _, cs) => cn == 10L && cs == 1 })
    // ties at the boundary break by key ascending (deterministic take)
    assert(prof.tail.map(_._1).toSeq === prof.tail.map(_._1).toSeq.sorted)
    assert(prof.tail.map(_._1).toSeq === Seq("conv-0", "conv-1", "conv-10", "conv-11"))

    // the counts aggregate itself must partial-aggregate map-side: the
    // profiler has to survive the very skew it measures (the hot key
    // reaches its reducer as one partial per map task, never raw rows)
    val countsPlan = skewed.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_rows")).queryExecution.executedPlan.toString
    assert(countsPlan.contains("partial_count") || countsPlan.contains("Partial"),
      s"per-key count must map-side combine:\n$countsPlan")
    assert("Exchange hashpartitioning".r.findAllIn(countsPlan).length === 1,
      s"profiler counts are one key shuffle:\n$countsPlan")
  }
}
