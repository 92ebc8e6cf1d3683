package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash fingerprint as one native codegen'd pass: lowercase →
  * whitespace tokens → 60-bit md5 per token → per-bit ±1 votes → sign
  * bits. Bit-identical to the composed form
  * (`Dedup.simhash` = transform(tokens)(md5Long) + `bits` interpreted
  * aggregate folds — which re-walk the token array once PER BIT; this
  * is one loop). Pinned equal by ExpressionsSpec.
  *
  * Null/empty text fingerprints to 0, exactly like the composed form
  * (tokens() coalesces null to "", an empty vote vector has no
  * positive bits).
  */
case class SimhashText(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_text"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"simhash_text expects a string argument, got ${child.dataType.catalogString}")
    else if (bits < 1 || bits > 60)
      TypeCheckResult.TypeCheckFailure(s"simhash_text needs 1 <= bits <= 60, got $bits")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SimhashText.compute(child.eval(input).asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = graft.expressions.SimhashText.compute(
          ${c.isNull} ? null : ${c.value}, $bits);
        """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashText =
    copy(child = newChild)
}

object SimhashText {

  val FnName = "simhash_text"

  private val Ws = Pattern.compile("\\s+")

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** One-pass simhash; null input behaves as the empty document. */
  def compute(s: UTF8String, bits: Int): Long = {
    if (s == null) return 0L
    val toks = Ws.split(s.toLowerCase.toString)
    val md = digest.get()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < toks.length) {
      if (!toks(i).isEmpty) {
        md.reset()
        val d = md.digest(toks(i).getBytes(StandardCharsets.UTF_8))
        // first 15 hex nibbles (Md5Long60 semantics)
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = (h << 4) | ((d(7) & 0xf0L) >> 4)
        var j = 0
        while (j < bits) {
          if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  /** The one expression builder — shared by [[register]] and
    * GraftExtensions so the two registration paths can't drift.
    */
  val builder: Seq[Expression] => Expression = exprs =>
    SimhashText(exprs.head, MinhashSig.intLiteral(FnName, "bits", exprs(1)))

  /** Idempotent per-session registration (temp function). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(FnName)))
      reg.createOrReplaceTempFunction(FnName, builder, "built-in")
  }

  /** Column form (Column↔Expression bridges are private[sql] in
    * Spark 4, so this routes through the function registry).
    */
  def apply(c: Column, bits: Int): Column = {
    register(SparkSession.active)
    call_function(FnName, c, lit(bits))
  }
}
