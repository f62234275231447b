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

  /** Compile: union the sources (tagged with `__source`), fold every
    * transform over the unified frame, gather per-destination predicates in
    * statement order, then emit route flags via the Router's precedence
    * ladder.
    */
  def compile(spark: SparkSession, cfg: Config): Compiled = {
    // unified source frame — one scan feeds every path, like the
    // reference's single reader feeding the whole pipe DAG per message
    val unified = cfg.sources
      .map { case (name, build) => build(spark).withColumn("__source", lit(name)) }
      .reduce(_ unionByName _)

    // pass 1: apply every transform in statement order so all derived
    // columns exist on the single frame (transforms are column-pure)
    var frame = unified
    def applyTransforms(els: Seq[Element]): Unit = els.foreach {
      case TransformE(f)   => frame = f(frame)
      case IfElse(bs, o)   => bs.foreach(b => applyTransforms(b._2)); applyTransforms(o)
      case Junction(chs)   => chs.foreach(applyTransforms)
      case _               => ()
    }
    cfg.paths.foreach(p => applyTransforms(p.elements))

    // pass 2: walk each path accumulating the filter conjunction up to each
    // destination (evaluated against the fully-transformed frame)
    val dests = Seq.newBuilder[DestSpec]
    def walk(els: Seq[Element], reach: Column, path: LogPath): Column = {
      var cur = reach
      els.foreach {
        case FilterE(p)    => cur = cur && coalesce(p(frame), lit(false))
        case TransformE(_) => ()
        case DestE(name) =>
          dests += DestSpec(name, cur, path.isFinal, path.isFallback, !path.isCatchAll)
        case IfElse(branches, otherwise) =>
          // exclusive ladder: each branch sees "no earlier branch matched"
          var noneEarlier: Column = lit(true)
          branches.foreach { case (p, body) =>
            val c = coalesce(p(frame), lit(false))
            walk(body, cur && noneEarlier && c, path)
            noneEarlier = noneEarlier && !c
          }
          walk(otherwise, cur && noneEarlier, path)
        case Junction(channels) =>
          channels.foreach(ch => walk(ch, cur, path))
      }
      cur
    }
    cfg.paths.foreach { p =>
      val srcPred =
        if (p.isCatchAll) lit(true)
        else col("__source").isin(p.sources: _*)
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
    Compiled(Router.withRouteFlags(frame, routeSpecs), names)
  }
}
