package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** add-contextual-data() — lookup enrichment from a small database keyed by a
  * selector template, with a `default-selector()` fallback (reference
  * modules/add-contextual-data/add-contextual-data.c:111-134, DB index
  * context-info-db.c:33-44).
  *
  * Spark-first shape: the database is broadcast and joined with a hash
  * lookup; the default-selector row is applied with a second broadcast join
  * against the misses, composed as one `coalesce` per enrichment column — a
  * single plan, no driver-side loops, safe at any fact-table scale because
  * only the dimension is broadcast.
  */
object ContextualData {

  /** The engine's built-in role/tool lookup database (FIXTURES.md §2).
    * Deterministic and tiny — mirrors the CSV databases the reference ships
    * in its e2e tests. Selector convention: `role:<role>` / `tool:<tool>` /
    * `default`.
    */
  val defaultRows: Seq[(String, String, String, Int)] = Seq(
    // note: no `role:system` entry — system turns exercise default-selector
    ("role:user", "product", "low", 6),
    ("role:assistant", "core", "high", 5),
    ("role:tool", "infra", "high", 4),
    ("tool:bash", "infra", "high", 3),
    ("tool:search", "core", "low", 5),
    ("tool:editor", "core", "high", 4),
    ("tool:browser", "product", "low", 6),
    ("default", "unassigned", "none", 7))

  /** Same database as portable SQL for the DuckDB oracle. */
  val lookupSqlValues: String = defaultRows
    .map { case (s, t, c, m) => s"('$s', '$t', '$c', $m)" }
    .mkString("(VALUES ", ", ", ") AS lookup(selector, team, cost_class, max_severity)")

  def lookupDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    defaultRows.toDF("selector", "team", "cost_class", "max_severity")
  }

  /** Enrich `df` by `selector`: left broadcast join, misses filled from the
    * `default` selector row (add-contextual-data.c default-selector
    * semantics). Enrichment columns = every lookup column except `selector`.
    *
    * The default row is resolved at plan-build time (one tiny driver read of
    * the dimension — which is broadcast whole anyway) and inlined as
    * literals: filling misses with a 1-row cross join would put a
    * BroadcastNestedLoopJoin stage in the fact table's hot path and break
    * whole-stage codegen; literals keep the enrichment a single
    * BroadcastHashJoin + codegen'd projection.
    */
  def enrich(df: DataFrame, lookup: DataFrame, selector: Column): DataFrame = {
    val enrichCols = lookup.columns.filterNot(_ == "selector")
    val defaultRow = lookup.filter(col("selector") === "default")
      .select(enrichCols.map(col): _*).collect().headOption
    val hits = lookup.filter(col("selector") =!= "default")
      .select(col("selector").as("__selector") +: enrichCols.map(c => col(c).as(s"__hit_$c")): _*)
    val joined = df.join(broadcast(hits), selector === col("__selector"), "left")
    val filled = enrichCols.map { c =>
      val i = enrichCols.indexOf(c)
      val d = defaultRow.map(r => lit(r.get(i))).getOrElse(lit(null))
      coalesce(col(s"__hit_$c"), d)
    }
    joined.withColumns(enrichCols.zip(filled).toMap)
      .drop("__selector").drop(enrichCols.map(c => s"__hit_$c"): _*)
  }
}
