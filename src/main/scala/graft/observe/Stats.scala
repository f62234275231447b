package graft.observe

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** The stats subsystem (reference lib/stats/): per-stage counters collected
  * without extra passes.
  *
  * Each pipeline stage is wrapped with `observed(df, stage)` —
  * `Dataset.observe` accumulates the counters inside the existing job (the
  * reference's per-pipe counters, stats-registry.c), and a
  * QueryExecutionListener snapshots them into a stats table with
  * (stage, counter, value, job) rows — the syslog-ng-ctl stats / Prometheus
  * exposition analog. Zero extra scans; the counters ride the action that
  * already ran.
  */
object Stats {

  /** Attach standard counters to a stage: processed rows + per-stage extras
    * (reference: processed/matched/not_matched per filter pipe).
    */
  def observed(df: DataFrame, stage: String, extra: (String, Column)*): DataFrame = {
    val metrics = count(lit(1)).as("processed") +: extra.map { case (n, c) => c.as(n) }
    df.observe(s"graft.$stage", metrics.head, metrics.tail: _*)
  }

  /** Collects observed metrics from every completed action on the session. */
  final class Collector extends QueryExecutionListener {
    private val buf = mutable.ArrayBuffer.empty[(String, String, Long, String)]

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val rows = qe.observedMetrics.collect {
        case (name, row) if name.startsWith("graft.") =>
          row.schema.fieldNames.map { f =>
            val v = row.getAs[Any](f) match {
              case l: Long => l
              case i: Int  => i.toLong
              case other   => Option(other).map(_.toString.toDouble.toLong).getOrElse(0L)
            }
            (name.stripPrefix("graft."), f, v, funcName)
          }.toSeq
      }.flatten
      buf.synchronized { buf ++= rows; () }
    }

    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()

    def snapshot(spark: SparkSession): DataFrame = {
      val rows = buf.synchronized(buf.toSeq)
      import spark.implicits._
      rows.toDF("stage", "counter", "value", "job")
    }

    def clear(): Unit = buf.synchronized { buf.clear(); () }
  }

  /** Install a collector on the session (idempotent per collector). */
  def install(spark: SparkSession): Collector = {
    val c = new Collector
    spark.listenerManager.register(c)
    c
  }

  /** The stats query language (reference lib/stats/stats-query.c:
    * `syslog-ng-ctl query get "stage.*.counter"`): glob over
    * `stage.counter` names against a stats snapshot.
    */
  def query(stats: DataFrame, glob: String): DataFrame = {
    val re = glob.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    }
    stats.filter(concat_ws(".", col("stage"), col("counter")).rlike("^" + re + "$"))
  }

  /** Per-partition lineage column (north rule): where each output row came
    * from — source file + reader partition. Carried through shuffles as
    * data, so sink rows remain attributable after fan-out.
    */
  def lineage: Column =
    struct(input_file_name().as("source_file"), spark_partition_id().as("source_partition"))
}
