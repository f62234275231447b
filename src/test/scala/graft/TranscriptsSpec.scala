package graft

import org.apache.spark.sql.functions._
import graft.transcripts.Transcripts

class TranscriptsSpec extends SparkSpec {

  test("schema matches input_hint") {
    val t = Transcripts.load(spark, sfUnit)
    assert(t.columns.toSeq == Seq("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    val types = t.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("conv_id") == "string")
    assert(types("turn_idx") == "int")
    assert(types("ts") == "timestamp" || types("ts") == "timestamp_ntz")
  }

  test("deterministic: two loads are identical") {
    val a = Transcripts.load(spark, sfUnit).orderBy("conv_id", "turn_idx").collect()
    val b = Transcripts.load(spark, sfUnit).orderBy("conv_id", "turn_idx").collect()
    assert(a.sameElements(b))
  }

  test("turn_idx dense and unique per conversation") {
    val t = Transcripts.load(spark, sfUnit)
    val bad = t.groupBy("conv_id")
      .agg(count(lit(1)).as("n"), max(col("turn_idx")).as("mx"),
        countDistinct(col("turn_idx")).as("d"))
      .filter(col("d") =!= col("n") || col("mx") =!= col("n") - 1)
      .count()
    assert(bad == 0)
  }

  test("roles cycle and tool only on tool turns") {
    val t = Transcripts.load(spark, sfUnit)
    assert(t.filter(col("role") === "tool" && col("tool").isNull).count() == 0)
    assert(t.filter(col("role") =!= "tool" && col("tool").isNotNull).count() == 0)
    val roles = t.select("role").distinct().collect().map(_.getString(0)).toSet
    assert(roles == Set("user", "assistant", "system", "tool"))
  }
}
