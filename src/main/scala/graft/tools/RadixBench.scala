package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.parsers.{GrokRule, GrokStage, PatternDb}

/** Micro-benchmark for the patterndb radix-dispatch claim: matching cost
  * must be ~independent of rule count, where an ordered regex alternation
  * (GrokStage) degrades linearly. Prints one JSON line:
  * rows/sec for {radix, grok} × {4, 100, 1000} rules over the same corpus.
  *
  * Usage: sbt "runMain graft.tools.RadixBench" (env SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_REP rows multiplier, default 20 → 2M rows).
  */
object RadixBench {

  private def pdbRules(n: Int): Seq[PatternDb.PdbRule] =
    (0 until n).map(i => PatternDb.PdbRule(s"r$i",
      Seq(s"svc-$i: op=@ESTRING:op: @took=@NUMBER:ms@ms rest=@ANYSTRING:r@")))

  private def grokRules(n: Int): Seq[GrokRule] =
    (0 until n).map(i => GrokRule(s"r$i",
      s"^svc-$i: op=(\\S+) took=(\\d+)ms rest=(.*)$$", Seq("op", "ms", "r")))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rep = sys.env.getOrElse("SPARK_GRAFT_REP", "20").toInt
    val nRows = rep * 100000L

    // corpus(n): rows spread uniformly over rule ids 0..n-1 (worst case
    // for an ordered alternation: expected n/2 regex attempts per row;
    // the radix trie dispatches in O(message length) regardless)
    def corpus(n: Int) = spark.range(nRows)
      .select(concat(lit("svc-"), pmod(col("id"), lit(n)).cast("string"),
        lit(": op=read took="), pmod(col("id"), lit(5000)).cast("string"),
        lit("ms rest=tail-"), col("id").cast("string")).as("text"))
      .repartition(64)

    val results = Seq(4, 100, 1000).flatMap { n =>
      val c = corpus(n).persist()
      require(c.count() == nRows)
      def time(f: => Long): Double = {
        f // warmup
        val t0 = System.nanoTime(); val got = f
        require(got == nRows, s"$got != $nRows")
        (System.nanoTime() - t0) / 1e9
      }
      val radix = time(PatternDb.annotate(c, "text", pdbRules(n)).count())
      val grok = time(GrokStage(c, "text", grokRules(n)).count())
      c.unpersist()
      Seq(s""""radix_$n":${(nRows / radix).toLong}""",
        s""""grok_$n":${(nRows / grok).toLong}""")
    }
    println(s"""{"metric":"rows_per_sec","n_rows":$nRows,${results.mkString(",")}}""")
    spark.stop()
  }
}
