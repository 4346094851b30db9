package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.functions.call_function

/** Scala DataFrame-side entry points for the native extraction expressions —
  * the Column twin of the SQL surface: after [[functions.register]] (or the
  * `spark.sql.extensions=graft.functions.GraftExtensions` config),
  * `df.select(functions.visible_text($"html"))` plans as a codegen'd
  * Catalyst expression, not a UDF.
  */
object functions {

  /** Register visible_text / text_content on a live session (the same
    * registration [[GraftExtensions]] performs at session build time).
    * Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("visible_text"),
      new ExpressionInfo(classOf[VisibleTextExpression].getName, "visible_text"),
      children => VisibleTextExpression(children.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("text_content"),
      new ExpressionInfo(classOf[TextContentExpression].getName, "text_content"),
      children => TextContentExpression(children.head))
  }

  /** Normalized visible text of an HTML document column. */
  def visible_text(html: Column): Column = call_function("visible_text", html)

  /** Unnormalized text-content concatenation of an HTML document column. */
  def text_content(html: Column): Column = call_function("text_content", html)
}
