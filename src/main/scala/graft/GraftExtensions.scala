package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotFold, Md5Long60, MinhashSig}

/** Session extensions: registers graft's native expressions for SQL
  * use. Attach with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier(Md5Long60.FnName),
      new ExpressionInfo(classOf[Md5Long60].getName, Md5Long60.FnName),
      (exprs: Seq[Expression]) => Md5Long60(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier(MinhashSig.FnName),
      new ExpressionInfo(classOf[MinhashSig].getName, MinhashSig.FnName),
      (exprs: Seq[Expression]) => MinhashSig(exprs.head,
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int])))
    e.injectFunction((
      new FunctionIdentifier(DotFold.FnName),
      new ExpressionInfo(classOf[DotFold].getName, DotFold.FnName),
      (exprs: Seq[Expression]) => DotFold(exprs.head, exprs(1))))
    // composed aggregate(zip_with(...)) dot products → native DotFold
    e.injectOptimizerRule(_ => graft.plans.RewriteDotFold)
  }
}
