package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the idiomatic higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[VecDot]]. HOF lambdas are interpreted per
  * element with boxed values; VecDot is one primitive loop inside
  * whole-stage codegen — so a user who writes the natural DataFrame form
  * gets the fast path automatically, the same way Catalyst rewrites other
  * declarative patterns into better physical shapes.
  *
  * The rewrite is exactly semantics-preserving because [[VecDot]] mirrors
  * the HOF null algebra (unequal lengths / null element / null array →
  * null) and folds in the same index order (bit-identical doubles). It
  * fires only when the pattern is provably the dot product:
  *  - zip lambda is a bare multiply of the two lambda variables (either
  *    order — IEEE multiplication is bitwise commutative),
  *  - zero is the exact +0.0 double literal,
  *  - merge lambda is a bare add of the two lambda variables (either
  *    order, same argument), and
  *  - the finish lambda is the identity.
  *
  * Injected via [[GraftExtensions]] (session extensions) or
  * `GraftFunctions.register`, which appends it to
  * `spark.experimental.extraOptimizations` for live sessions.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def bothVars(e1: Expression, e2: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (e1.semanticEquals(v1) && e2.semanticEquals(v2)) ||
      (e1.semanticEquals(v2) && e2.semanticEquals(v1))

  private def isPlusZeroDouble(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(m1, m2, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(Add(s1, s2, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if isPlusZeroDouble(zero) && bothVars(m1, m2, x, y) &&
            bothVars(s1, s2, acc, v) && fin.semanticEquals(fv) =>
        VecDot(a, b)
    }
}
