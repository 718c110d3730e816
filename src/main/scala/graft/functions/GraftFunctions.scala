package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function

/** Registration of the engine's custom Catalyst expressions.
  *
  * Two entry points:
  *   - [[GraftExtensions]] for `spark.sql.extensions` / `withExtensions`
  *     (the idiomatic plugin path on a real cluster);
  *   - [[GraftFunctions.register]] for an already-built session (the local
  *     harness and tests).
  *
  * The reference's extension surface is "any Rust closure over the message
  * stream" (reference: callysto/src/types/agent.rs:86-91); ours is typed
  * Catalyst expressions that stay inside whole-stage codegen.
  */
object GraftFunctions {

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (args => DotProduct(args(0), args(1))),
    "graft_norm" -> (args => L2Norm(args(0))),
    "graft_cosine" -> (args => CosineSimilarity(args(0), args(1)))
  )

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[DotProduct].getName, name)

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info(name), b)
    }

  // Column-API wrappers.
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def norm(a: Column): Column = call_function("graft_norm", a)
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
}

/** `spark.sql.extensions`-compatible injector. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    Seq[(String, Seq[Expression] => Expression)](
      "graft_dot" -> (args => DotProduct(args(0), args(1))),
      "graft_norm" -> (args => L2Norm(args(0))),
      "graft_cosine" -> (args => CosineSimilarity(args(0), args(1)))
    ).foreach { case (name, b) =>
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo(classOf[DotProduct].getName, name), b)
      )
    }
}
