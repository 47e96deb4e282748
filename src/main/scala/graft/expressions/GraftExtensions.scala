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
  import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
  import org.apache.spark.sql.catalyst.expressions.{
    Cast,
    Divide,
    LambdaFunction,
    Literal,
    Multiply,
    UnresolvedNamedLambdaVariable
  }
  import org.apache.spark.sql.types.{DoubleType, LongType}

  /** Unresolved built-in call — resolves bottom-up exactly like the
    * same function written in SQL text would.
    */
  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(name, args, isDistinct = false)

  private def register(name: String, arity: Int)(
      build: Seq[Expression] => Expression
  ): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (
      FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      (children: Seq[Expression]) => {
        require(children.length == arity, s"$name expects $arity arguments, got ${children.length}")
        build(children)
      }
    )

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DotProductRewrite)
    // SQL MERGE door: rewrite a resolved MergeIntoTable over a timebox
    // relation into the library upsert (see graft.sources.TimeboxMerge)
    ext.injectPostHocResolutionRule(session => graft.sources.TimeboxMergeRule(session))
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
    // The engine's scalar surface, reachable from SQL text. Each tree
    // mirrors its Column-API definition in graft.functions/{FixedPoint,
    // VectorFunctions} and Dedup.normText (ExpressionSpec pins the
    // equivalence): fixed-point codecs, text normalization, and the
    // quantized-vector kernel the dedup/similarity operators build on.
    ext.injectFunction(register("graft_cents", 1) { cs =>
      Cast(fn("round", Multiply(cs.head, Literal(100))), LongType)
    })
    ext.injectFunction(register("graft_micro", 1) { cs =>
      Cast(fn("round", Multiply(cs.head, Literal(1e6))), LongType)
    })
    ext.injectFunction(register("graft_from_cents", 1) { cs =>
      Divide(Cast(cs.head, DoubleType), Literal(100.0))
    })
    ext.injectFunction(register("graft_norm_text", 1) { cs =>
      fn(
        "trim",
        fn(
          "regexp_replace",
          fn("regexp_replace", fn("lower", cs.head), Literal("[^a-z0-9 ]"), Literal(" ")),
          Literal(" +"),
          Literal(" ")
        )
      )
    })
    ext.injectFunction(register("graft_quantize_micro", 1) { cs =>
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val body = Cast(fn("round", Multiply(Cast(x, DoubleType), Literal(1000000))), LongType)
      fn("transform", cs.head, LambdaFunction(body, Seq(x)))
    })
    ext.injectFunction(register("graft_norm2", 1) { cs =>
      LongDotProduct(cs.head, cs.head)
    })
    ext.injectFunction(register("graft_cos_q", 3) { cs =>
      Divide(
        Cast(cs(0), DoubleType),
        fn("sqrt", Multiply(Cast(cs(1), DoubleType), Cast(cs(2), DoubleType)))
      )
    })
  }
}
