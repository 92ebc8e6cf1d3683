package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Sequential dot product of two float/double array columns as a native
  * codegen'd expression — the hot inner loop of cosine similarity
  * (ANN top-k, embedding near-dups).
  *
  * Bit-identical to the composed higher-order form
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, _+_)` (graft.functions.dot's
  * executable spec, pinned equal by ExpressionsSpec) and to the DuckDB
  * oracle's `list_reduce(list_prepend(0.0,...))`: the same left-to-right
  * IEEE-754 adds of per-element double products, so fixed-point ranks
  * agree across engines. Null semantics mirror zip_with+aggregate:
  * mismatched lengths or a null element poison the fold → null.
  *
  * The composed form walks an expression tree per element (interpreted
  * lambdas, ~3 tree evals per element per dot); this is a compiled
  * loop, which is what you want when scoring 10^9 query×candidate
  * pairs.
  */
case class DotFold(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_fold"

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_fold expects two array<float|double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(a: Any, b: Any): Any =
    DotFold.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
        java.lang.Double $tmp = graft.expressions.DotFold.compute(
          $a, $b, ${isFloat(left.dataType)}, ${isFloat(right.dataType)});
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

object DotFold {

  val FnName = "dot_fold"

  /** Left-to-right Σ a_i·b_i in doubles; null on length mismatch or a
    * null element (zip_with+aggregate null semantics).
    */
  def compute(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** The one expression builder — shared by [[register]] and
    * GraftExtensions so the two registration paths can't drift.
    */
  val builder: Seq[Expression] => Expression = exprs => DotFold(exprs.head, exprs(1))

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
