package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's `program()` source and destination
  * (reference `modules/afprog/afprog.c`): spawn a shell command, write
  * newline-delimited formatted messages to its stdin (destination) or read
  * newline-delimited records from its stdout (source).
  *
  * Spark mapping: `RDD.pipe` IS this driver — one subprocess per
  * partition, rows streamed through stdin/stdout. That strictly
  * generalizes the reference (one process per daemon): a 1000-executor
  * cluster runs 1000 command instances in parallel, each seeing only its
  * partition's rows, which is the correct contract for per-line filters
  * (the only kind that can fan out; a command that needs the TOTAL stream
  * order gets `coalesce(1)`, the honest single-process reduction).
  *
  * As in the reference, the command is spawned via the shell
  * (`afprog.c` uses `/bin/sh -c`), is restarted per batch rather than
  * kept alive (batch jobs have natural lifecycles; the reference's
  * keep-alive exists because its daemon never exits), and a non-zero exit
  * fails the task (reference stops the destination on command-not-found,
  * afprog.c:470-505).
  */
object Program {

  /** Destination: render `body` per row (codegen), pipe the lines through
    * `command`, return the command's stdout lines (often empty for pure
    * sinks — `wc -l`-style commands make it a transform).
    */
  def write(df: DataFrame, command: String, body: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df.select(body.cast("string").as("line")).na.drop()
      .as[String].rdd
      .pipe(Seq("/bin/sh", "-c", command))
    spark.createDataset(lines).toDF("record")
  }

  /** Source: run `command` once per requested partition slot and read its
    * stdout as newline records. The reference's program() source is one
    * process; `partitions=1` reproduces that, higher values shard the
    * command — each instance receives its shard index as one stdin line
    * (the per-instance channel; a sharded producer reads it and emits its
    * slice).
    */
  def read(spark: SparkSession, command: String, partitions: Int = 1): DataFrame = {
    import spark.implicits._
    val lines = spark.sparkContext
      .parallelize(0 until partitions, partitions)
      .map(_.toString)
      .pipe(Seq("/bin/sh", "-c", command))
    spark.createDataset(lines).toDF("record")
  }
}
