package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-timing tool: run SparkEntry queries twice each (cold + warm, the
  * Bench discipline) and print wall seconds. Complements [[graft.Explain]],
  * which prints the plan without executing.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <query>[,query...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("graft-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.queries("q_sink_counts")(spark, sfDir).count()
    catch { case _: Throwable => () } // warmup: codegen + page cache
    names.foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
