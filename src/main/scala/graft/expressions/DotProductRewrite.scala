package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the codegen'd [[LongDotProduct]]. The HOF formulation is what a
  * user naturally writes, but ArrayAggregate/ZipWith are CodegenFallback
  * — interpreted lambdas, boxing, broken WholeStageCodegen spans. The
  * rewrite is sound because LongDotProduct deliberately reproduces the
  * HOF null semantics (null on length mismatch or null element) and the
  * same wrapping long arithmetic.
  *
  * Injected by [[GraftExtensions]] via injectOptimizerRule, so ANY query
  * in the session — Column API or SQL text — gets the fast path without
  * code changes.
  *
  * ANSI note: under ANSI mode the HOF's Multiply/Add RAISE on long
  * overflow, where the bare loop would wrap. The rewrite therefore
  * emits the overflow-CHECKING variant of [[LongDotProduct]]
  * (failOnError = true) in ANSI sessions, so swapping formulations
  * never silently removes an overflow error from a user query.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _), zargs, _)),
          Literal(0L, LongType),
          LambdaFunction(Add(aacc: NamedLambdaVariable, avar: NamedLambdaVariable, _), margs, _),
          LambdaFunction(fin: NamedLambdaVariable, fargs, _)
        )
        if isLongArray(a) && isLongArray(b) &&
          Set(mx.exprId, my.exprId) == zargs.map(_.exprId).toSet &&
          Set(aacc.exprId, avar.exprId) == margs.map(_.exprId).toSet &&
          fargs.headOption.exists(_.exprId == fin.exprId) =>
      LongDotProduct(a, b, failOnError = conf.ansiEnabled)
  }
}
