package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: registers graft's native expressions with
  * the session's FunctionRegistry, so they are usable from SQL text
  * (`SELECT long_dot(a, b)`) as well as the Column API.
  *
  * Wire up either way:
  *   - `spark.sql.extensions=graft.expressions.GraftExtensions` on any
  *     cluster (no code changes — the standard deployment path), or
  *   - `GraftSession.builder()` which sets the conf itself.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectFunction(
      (
        FunctionIdentifier("long_dot"),
        new ExpressionInfo(classOf[LongDotProduct].getName, "long_dot"),
        (children: Seq[Expression]) => {
          require(children.length == 2, s"long_dot expects 2 arguments, got ${children.length}")
          LongDotProduct(children.head, children(1))
        }
      )
    )
  }
}
