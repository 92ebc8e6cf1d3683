package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5-derived hash as a native Catalyst expression with
  * codegen — the hot inner hash of minhash/simhash/fingerprinting.
  *
  * Semantics are EXACTLY `conv(substring(md5(s), 1, 15), 16, 10) cast
  * long` (= the DuckDB oracle's `('0x'||substr(md5(s),1,15))::bigint`):
  * the first 15 hex nibbles of the digest, i.e. bytes 0..6 plus the
  * high nibble of byte 7. Computing from digest bytes skips the
  * 32-char hex string, the substring, and conv's string parse — fewer
  * allocations per call, which matters because these calls run inside
  * interpreted higher-order-function lambdas.
  */
case class Md5Long60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_long60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_long60 expects a string argument, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    Md5Long60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Long60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60 =
    copy(child = newChild)
}

object Md5Long60 {

  val FnName = "md5_long60"

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of md5(bytes) as a long (0 <= v < 2^60). */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** The one expression builder — shared by [[register]] and
    * GraftExtensions so the two registration paths can't drift.
    */
  val builder: Seq[Expression] => Expression = exprs => Md5Long60(exprs.head)

  /** Idempotent per-session registration (temp function); the
    * exists-check keeps re-registration (and its "replaced a previously
    * registered function" log line) out of per-query paths.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(FnName)))
      reg.createOrReplaceTempFunction(FnName, builder, "built-in")
  }

  /** Column form: registers in the active session, then resolves via
    * the public call_function API (Column↔Expression bridges are
    * private[sql] in Spark 4).
    */
  def apply(c: Column): Column = {
    register(SparkSession.active)
    call_function(FnName, c)
  }
}
