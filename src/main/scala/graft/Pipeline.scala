package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.transcripts.Transcripts
import graft.parsers.GrokStage

/** The flagship end-to-end job: parse → enrich → route → aggregate over the
  * transcript table (north rule). Placeholder stages are swapped for the real
  * router/enricher as they land.
  */
object Pipeline {
  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Transcripts.load(spark, sfDir)
    val parsed = GrokStage(t, "text", GrokStage.transcriptRules)
    parsed
      .groupBy(col("role"), col("rule_id"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("n"))
  }
}
