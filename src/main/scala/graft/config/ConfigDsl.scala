package graft.config

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.routing.{RouteSpec, Router}

/** The engine's configuration surface — the analog of the reference's
  * config language (reference lib/cfg-tree.h:62 LogExprNode layouts:
  * sequence / junction / conditional over source/filter/parser/rewrite/
  * destination contents).
  *
  * A `Config` is IR #1 (the statement tree); `Compiler.compile` produces
  * IR #2 — not a pipe DAG like the reference (lib/cfg-tree.c:1500
  * cfg_tree_compile) but ONE Catalyst plan: transforms fold left over the
  * frame, filter chains become route predicates, and destinations become
  * route flags with the reference's final/fallback/catch-all precedence
  * (lib/logmpx.c:79-124) — then each sink is a filtered view of the single
  * flagged plan (persist-once fan-out, the COW-clone analog).
  */
object Dsl {

  sealed trait Element

  /** filter {} — predicate over the current frame; non-match is a routing
    * signal for the enclosing path, not row deletion (reference
    * lib/filter/filter-pipe.c:82-86).
    */
  final case class FilterE(pred: DataFrame => Column) extends Element

  /** parser {} / rewrite {} — frame transform (adds/changes columns;
    * must not drop rows — row-dropping configs use drop-unmatched on the
    * path instead, like the reference).
    */
  final case class TransformE(f: DataFrame => DataFrame) extends Element

  /** destination {} — terminal; collects rows that reached this point. */
  final case class DestE(name: String) extends Element

  /** if (f) {…} elif (f) {…} else {…} — compiles to a junction of
    * filtered channels (reference lib/cfg-tree.c:1279-1346).
    */
  final case class IfElse(
      branches: Seq[(DataFrame => Column, Seq[Element])],
      otherwise: Seq[Element]) extends Element

  /** junction { channel {…} channel {…} } — parallel branches rejoined
    * (reference cfg-tree.c:1175).
    */
  final case class Junction(channels: Seq[Seq[Element]]) extends Element

  /** log {} statement: source refs + element sequence + path flags
    * (reference lib/cfg-tree.c:628-639).
    */
  final case class LogPath(
      sources: Seq[String],
      elements: Seq[Element],
      isFinal: Boolean = false,
      isFallback: Boolean = false,
      isCatchAll: Boolean = false)

  final case class Config(
      sources: Map[String, SparkSession => DataFrame],
      paths: Seq[LogPath])
}

/** Compiles a Config to one flagged Catalyst plan in a single in-order
  * walk that mirrors message flow in the reference:
  *
  * - each filter is *frozen* at its position (materialized as a boolean
  *   helper column over the frame state at that point), so a later rewrite
  *   of a column cannot retroactively change an earlier filter's verdict —
  *   the reference evaluates filters on the message as it flows past
  *   (lib/filter/filter-pipe.c:82-86);
  * - each transform is *guarded* by its reach predicate (source match ∧
  *   frozen filters ∧ branch conditions): columns it writes become
  *   `when(reach, new).otherwise(old)`, so a rewrite inside an `if` branch
  *   or junction channel mutates only rows that entered it — the
  *   reference's COW-clone-per-branch semantics (lib/logmpx.c
  *   write-protect, cfg-tree.c:1279-1346 conditional compile).
  *
  * Declared divergence from the reference's full COW model: paths are
  * walked in statement order over one shared frame, so when two paths read
  * the same source and BOTH rewrite the SAME column, the later path's
  * filters see the earlier path's writes for rows in the reach overlap
  * (reference gives every path a private copy). Transforms scoped by
  * disjoint sources/filters/branches — the practical case — are isolated.
  */
object Compiler {
  import Dsl._

  /** One compiled destination: name + the predicate that routes a row of
    * the unified frame into it + path flags.
    */
  private final case class DestSpec(
      name: String, pred: Column, isFinal: Boolean, isFallback: Boolean,
      countsAsMatch: Boolean)

  final case class Compiled(flagged: DataFrame, sinkNames: Seq[String]) {
    def sink(name: String): DataFrame = Router.sink(flagged, name)
    def dropUnmatched: DataFrame = Router.dropUnmatched(flagged)
  }

  private val HelperPrefix = "__graft_p"

  def compile(spark: SparkSession, cfg: Config): Compiled = {
    // unified source frame — one scan feeds every path, like the
    // reference's single reader feeding the whole pipe DAG per message
    val unified = cfg.sources
      .map { case (name, build) => build(spark).withColumn("__source", lit(name)) }
      .reduce(_ unionByName _)

    var frame = unified
    var helperId = 0
    val helperCols = Seq.newBuilder[String]

    // freeze a predicate against the CURRENT frame state as a boolean
    // helper column; route flags and transform guards reference the frozen
    // value, immune to later rewrites of its inputs
    def freeze(pred: Column): Column = {
      val name = s"$HelperPrefix$helperId"
      helperId += 1
      helperCols += name
      frame = frame.withColumn(name, coalesce(pred, lit(false)))
      col(name)
    }

    // apply a transform only where `reach` holds: stash pre-images, run the
    // transform, blend per column. reach == None ⇒ unguarded (whole-path
    // transform ahead of any filter), plain application
    def applyTransform(f: DataFrame => DataFrame, reach: Option[Column]): Unit = reach match {
      case None => frame = f(frame)
      case Some(r) =>
        val origCols = frame.columns.toSeq
        val stashOf = origCols.map(c => c -> s"__graft_s${helperId}_$c").toMap
        helperId += 1
        val stashed = frame.select(
          origCols.map(col) ++ origCols.map(c => col(c).as(stashOf(c))): _*)
        val t = f(stashed)
        val outCols = t.columns.toSeq.filterNot(_.startsWith("__graft_s"))
        val blended = outCols.map { c =>
          if (origCols.contains(c)) when(r, col(c)).otherwise(col(stashOf(c))).as(c)
          else when(r, col(c)).as(c) // new column: NULL outside the reach
        }
        frame = t.select(blended: _*)
    }

    val dests = Seq.newBuilder[DestSpec]

    // single in-order walk; returns nothing — dests and frame accumulate.
    // `reach`: None = unconditional so far (plain transforms, cheapest plan)
    def walk(els: Seq[Element], reach0: Option[Column], path: LogPath): Unit = {
      var reach = reach0
      def and(c: Column): Option[Column] = Some(reach.map(_ && c).getOrElse(c))
      els.foreach {
        case FilterE(p)    => reach = and(freeze(p(frame)))
        case TransformE(f) => applyTransform(f, reach)
        case DestE(name) =>
          dests += DestSpec(name, reach.getOrElse(lit(true)),
            path.isFinal, path.isFallback, !path.isCatchAll)
        case IfElse(branches, otherwise) =>
          // exclusive ladder; every branch predicate frozen BEFORE any
          // branch body transform can touch its inputs
          var noneEarlier: Column = lit(true)
          branches.foreach { case (p, body) =>
            val c = freeze(p(frame))
            walk(body, Some(reach.map(_ && noneEarlier && c).getOrElse(noneEarlier && c)), path)
            noneEarlier = noneEarlier && !c
          }
          walk(otherwise, Some(reach.map(_ && noneEarlier).getOrElse(noneEarlier)), path)
        case Junction(channels) =>
          channels.foreach(ch => walk(ch, reach, path))
      }
    }

    cfg.paths.foreach { p =>
      val srcPred: Option[Column] =
        if (p.isCatchAll) None
        else if (cfg.sources.size == 1 && p.sources == cfg.sources.keys.toSeq) None
        else Some(col("__source").isin(p.sources: _*))
      walk(p.elements, srcPred, p)
    }

    // merge same-destination predicates (a dest referenced from several
    // paths receives the union), preserving first-appearance order
    val specs = dests.result()
    val names = specs.map(_.name).distinct
    val routeSpecs = names.map { n =>
      val ds = specs.filter(_.name == n)
      RouteSpec(
        name = n,
        predicate = ds.map(_.pred).reduce(_ || _),
        isFinal = ds.exists(_.isFinal),
        isFallback = ds.forall(_.isFallback),
        countsAsMatch = ds.exists(_.countsAsMatch))
    }
    val flagged = Router.withRouteFlags(frame, routeSpecs)
    // frozen-predicate helpers are internal: drop them from the sink-facing
    // plan (Catalyst prunes their computation where flags don't need them)
    Compiled(flagged.drop(helperCols.result(): _*), names)
  }
}
