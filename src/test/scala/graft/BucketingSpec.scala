package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketing: the co-located-join pattern for repeated joins on the same
  * key (conv_id) — both sides pre-bucketed means the sort-merge join runs
  * with NO exchange at query time, the cluster-scale answer to repeatedly
  * joining 100 TB of transcripts against per-conversation state.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle; unbucketed join needs two") {
    val base = Files.createTempDirectory("graft-buckets").toString
    val t = graft.transcripts.Transcripts.load(spark, sfUnit)
    val sessions = t.groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"), max("ts").as("last_ts"))

    t.write.format("parquet").option("path", s"$base/turns")
      .bucketBy(8, "conv_id").sortBy("conv_id")
      .saveAsTable("graft_turns_b")
    sessions.write.format("parquet").option("path", s"$base/sessions")
      .bucketBy(8, "conv_id").sortBy("conv_id")
      .saveAsTable("graft_sessions_b")
    try {
      // force the sort-merge path: with the dimension broadcast-sized the
      // planner would skip bucketed scans entirely (and rightly so — this
      // pattern pays off when BOTH sides are beyond broadcast size)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_turns_b")
        .join(spark.table("graft_sessions_b"), "conv_id")
      val plan = joined.queryExecution.executedPlan.toString()
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() === t.count())

      // control: the same join over plain parquet shuffles both sides
      val plain = t.join(sessions, "conv_id")
      val planPlain = plain.queryExecution.executedPlan.toString()
      assert(planPlain.contains("Exchange") ||
        planPlain.contains("BroadcastExchange")) // small side may broadcast
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_turns_b")
      spark.sql("DROP TABLE IF EXISTS graft_sessions_b")
    }
  }
}
