package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Nearest-centroid argmax over an ARRAY of candidate centroids as one
  * native codegen'd expression — the row-explosion-free inner loop of
  * the two-level quantizer's level-2 assignment
  * (Similarity.assignSubCells).
  *
  * Args: (emb array<float|double>, cents array<struct<cid2 int,
  * cemb array<double>>>, cid2-sorted). Returns the cid2 of the
  * best candidate under EXACTLY the engine's shared scoring contract:
  * fixed-point floor(cos·10^6) with the zero-norm guard (zero vector
  * or zero centroid scores 0 — Similarity.scoreFixedSafe / the
  * oracle's scoreFixedSafeSql), first-max scanning cid2 ascending =
  * (score desc, cid2 asc), the assignment tie-break everywhere else
  * in the engine. Each dot keeps DotFold's left-to-right IEEE-754 add
  * order, so results are bit-identical to the exploded
  * join + max_by formulation this replaces — but one input row stays
  * ONE row: no k2× candidate blowup carrying vector payloads through
  * a join and an aggregate (the measured 45 s/pass → ~2 s/pass
  * difference at gen-sf10).
  *
  * Null semantics: null emb or null cents array → null; a candidate
  * with a null element or mismatched length is skipped (DotFold's
  * null-poisoned dot can never win); no valid candidate → null.
  */
case class BestCell(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = BestCell.FnName

  private def embOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def centsOk(t: DataType): Boolean = t match {
    case ArrayType(StructType(Array(
      StructField(_, IntegerType, _, _),
      StructField(_, ArrayType(DoubleType, _), _, _))), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (embOk(left.dataType) && centsOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${BestCell.FnName} expects (array<float|double>, array<struct<int," +
        s" array<double>>>), got ${left.dataType.catalogString} and " +
        s"${right.dataType.catalogString}")

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(a: Any, b: Any): Any =
    BestCell.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("best")
      s"""
        java.lang.Integer $tmp = graft.expressions.BestCell.compute($a, $b, $isFloat);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp.intValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BestCell =
    copy(left = newLeft, right = newRight)
}

object BestCell {

  val FnName = "best_cell"

  def compute(emb: ArrayData, cents: ArrayData,
      embFloat: Boolean): java.lang.Integer = {
    val n = emb.numElements()
    // ‖emb‖² once per row (k+1 dots per row, not 2k — the same
    // let-bound-norm discipline as Similarity.assignCell)
    var na = 0.0
    var i = 0
    while (i < n) {
      if (emb.isNullAt(i)) return null
      val x = if (embFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      na += x * x
      i += 1
    }
    var found = false
    var bestS = Long.MinValue
    var bestC = -1
    var j = 0
    val m = cents.numElements()
    while (j < m) {
      if (!cents.isNullAt(j)) {
        val cand = cents.getStruct(j, 2)
        if (!cand.isNullAt(0) && !cand.isNullAt(1)) {
          val cid2 = cand.getInt(0)
          val cemb = cand.getArray(1)
          if (cemb.numElements() == n) {
            var dotv = 0.0
            var nb = 0.0
            var ok = true
            var t = 0
            while (ok && t < n) {
              if (cemb.isNullAt(t)) ok = false
              else {
                val x = if (embFloat) emb.getFloat(t).toDouble else emb.getDouble(t)
                val y = cemb.getDouble(t)
                dotv += x * y
                nb += y * y
                t += 1
              }
            }
            if (ok) {
              val s =
                if (na == 0.0 || nb == 0.0) 0L
                else math.floor(dotv / (math.sqrt(na) * math.sqrt(nb))
                  * 1000000.0).toLong
              if (!found || s > bestS) { found = true; bestS = s; bestC = cid2 }
            }
          }
        }
      }
      j += 1
    }
    if (!found) null else Integer.valueOf(bestC)
  }

  /** The one expression builder — shared by [[register]] and
    * GraftExtensions so the two registration paths can't drift.
    */
  val builder: Seq[Expression] => Expression = exprs => BestCell(exprs.head, exprs(1))

  /** Idempotent per-session registration (temp function). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(FnName)))
      reg.createOrReplaceTempFunction(FnName, builder, "built-in")
  }

  /** Column form (Column↔Expression bridges are private[sql] in
    * Spark 4, so this routes through the function registry).
    */
  def apply(emb: Column, cents: Column): Column = {
    register(SparkSession.active)
    call_function(FnName, emb, cents)
  }
}
