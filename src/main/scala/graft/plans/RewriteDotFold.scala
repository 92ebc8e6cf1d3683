package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.expressions.DotFold

/** Optimizer rule: recognize the composed higher-order dot-product
  * pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0, (acc, v) -> acc + v)
  *
  * and rewrite it to the native codegen'd [[DotFold]] — so SQL users
  * and composed-column callers get the compiled loop without knowing
  * the native function exists. Sound because DotFold is bit-identical
  * to this exact fold (same left-to-right IEEE adds, same null
  * semantics; pinned by ExpressionsSpec), so the rewrite never changes
  * results — it only moves the work out of interpreted lambda
  * evaluation. Injected via `GraftExtensions` (injectOptimizerRule).
  */
object RewriteDotFold extends Rule[LogicalPlan] {

  /** x, Cast(x as double), or an ANSI try-eval cast of x. */
  private object ToDouble {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(c, DoubleType, _, _) => Some(c)
      case other if other.dataType == DoubleType => Some(other)
      case _ => None
    }
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  /** (acc, v) -> acc + v over doubles. */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l, r, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      isVar(l, acc) && isVar(r, v)
    case _ => false
  }

  /** acc -> acc (the default finish lambda of `aggregate`). */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(acc: NamedLambdaVariable), _) => isVar(body, acc)
    case _ => false
  }

  private def isZeroLit(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** (x, y) -> double(x) * double(y) with vars used in declared order. */
  private def mulOfVars(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(ToDouble(l), ToDouble(r), _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      isVar(l, x) && isVar(r, y)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, zipFn), zero, mergeFn, finishFn)
          if mulOfVars(zipFn) && isZeroLit(zero) &&
            isSumMerge(mergeFn) && isIdentityFinish(finishFn) &&
            DotFold(a, b).checkInputDataTypes().isSuccess =>
        DotFold(a, b)
    }
}
