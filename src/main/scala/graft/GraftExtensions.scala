package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.RegexpReplaceFirst

/** Session extension registering the engine's custom Catalyst expressions
  * as SQL functions — usable from `spark.sql(...)` and SQL files, not just
  * the Scala DSL:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * or programmatically on an existing session via
  * [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private type Builder = Seq[Expression] => Expression

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("regexp_replace_first"),
      new ExpressionInfo(classOf[RegexpReplaceFirst].getName, "regexp_replace_first"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "regexp_replace_first(str, regexp, rep)")
        RegexpReplaceFirst(children(0), children(1), children(2))
      }))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
