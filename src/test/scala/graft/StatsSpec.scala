package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Observability: per-stage counters via observe() into the stats table,
  * and per-partition lineage on sink rows (reference lib/stats + north
  * rule's lineage requirement).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("writeSinks emits a stats table and lineage columns") {
    val out = Files.createTempDirectory("graft-stats").toString
    val counts = Pipeline.writeSinks(spark, sfUnit, out)

    val stats = spark.read.parquet(s"$out/stats")
      .select("stage", "counter", "value")
      .as[(String, String, Long)].collect()
    // the flagged stage observed once per sink write action; processed ==
    // full row count each time
    val processed = stats.filter(s => s._1 == "flagged" && s._2 == "processed")
    assert(processed.nonEmpty && processed.forall(_._3 == counts("all")))
    val parseErr = stats.filter(s => s._1 == "flagged" && s._2 == "parse_errors")
    assert(parseErr.nonEmpty && parseErr.forall(_._3 > 0)) // corrupt lines exist
    // per-sink stages observed with their own counts
    assert(stats.exists(s => s._1 == "sink_errors" && s._2 == "processed"))

    val allRows = spark.read.parquet(s"$out/sink_all")
    assert(allRows.columns.contains("lineage"))
    val lin = allRows.select("lineage.source_partition").distinct().count()
    assert(lin >= 1)
  }
}
