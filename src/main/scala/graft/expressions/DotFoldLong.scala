package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two bigint array columns — the
  * compiled inner loop of random-projection scoring
  * ([[graft.operators.Similarity.rpScoreFixed]]): dots and norms over
  * projected fixed-point vectors are pure BIGINT sums, and a corpus
  * scan scores |queries| candidates per row, so the interpreted
  * higher-order form (`aggregate(zip_with(a,b,(x,y)=>x*y), 0L, _+_)`,
  * kept as this expression's executable spec in ExpressionsSpec) walks
  * an expression tree per element where this runs a while-loop.
  * Measured on the q231 shortlist scan at gen-sf10: the HOF form was
  * the row's dominant term.
  *
  * Integer overflow is the CALLER's contract (projected components are
  * ≤ dim·10^6, so products stay ≤ ~4·10^15 and any realistic outDims
  * sum is far from Long range); the loop adds raw longs exactly like
  * the HOF fold, so the two forms are bit-identical wherever the
  * contract holds. Null semantics mirror zip_with+aggregate:
  * mismatched lengths or a null element → null.
  */
case class DotFoldLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_fold_long"

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_fold_long expects two array<bigint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  protected override def nullSafeEval(a: Any, b: Any): Any =
    DotFoldLong.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotl")
      s"""
        java.lang.Long $tmp = graft.expressions.DotFoldLong.compute($a, $b);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp.longValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFoldLong =
    copy(left = newLeft, right = newRight)
}

object DotFoldLong {

  val FnName = "dot_fold_long"

  /** Σ a_i·b_i in raw longs; null on length mismatch or null element. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** The one expression builder — shared by [[register]] and
    * GraftExtensions so the two registration paths can't drift.
    */
  val builder: Seq[Expression] => Expression =
    exprs => DotFoldLong(exprs.head, exprs(1))

  /** Idempotent per-session registration (temp function). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(FnName)))
      reg.createOrReplaceTempFunction(FnName, builder, "built-in")
  }

  /** Column form (Column↔Expression bridges are private[sql] in
    * Spark 4, so this routes through the function registry).
    */
  def apply(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function(FnName, a, b)
  }
}
