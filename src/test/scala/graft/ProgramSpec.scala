package graft

import org.apache.spark.sql.functions._

import graft.sinks.Program

/** program() source/destination via RDD.pipe (reference modules/afprog). */
class ProgramSpec extends SparkSpec {
  import spark.implicits._

  test("destination: formatted rows stream through the command's stdin") {
    val df = spark.range(100).selectExpr("concat('msg-', id) AS m").repartition(4)
    // grep as a per-line filter command: only multiples of 10 survive
    val out = Program.write(df, "grep '0$'", col("m"))
    assert(out.count() === 10)
    assert(out.as[String].collect().toSet === (0 until 100 by 10).map(i => s"msg-$i").toSet)
  }

  test("destination: command sees only its partition (wc -l per process)") {
    val df = spark.range(80).selectExpr("cast(id AS string) AS m").repartition(4)
    val counts = Program.write(df, "wc -l", col("m")).as[String]
      .collect().map(_.trim.toLong)
    assert(counts.length === 4 && counts.sum === 80)
  }

  test("source: command stdout becomes records; shard index rides stdin") {
    val one = Program.read(spark, "seq 1 5")
    assert(one.as[String].collect().map(_.toInt).sorted.toSeq === (1 to 5))
    // sharded: each instance reads its index i and emits i
    val sharded = Program.read(spark, "read i; echo \"shard-$i\"", partitions = 3)
    assert(sharded.as[String].collect().toSet === Set("shard-0", "shard-1", "shard-2"))
  }

  test("non-zero exit fails the job (afprog.c:470 command-not-found stop)") {
    val df = spark.range(3).selectExpr("cast(id AS string) AS m").coalesce(1)
    intercept[org.apache.spark.SparkException] {
      Program.write(df, "exit 7", col("m")).count()
    }
  }
}
