package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-minhash-signature as ONE native codegen'd expression: lowercase
  * → whitespace tokens → md5-60bit per token (mod p) → polynomial
  * word-n-gram combine → k affine minima, all in a single compiled JVM
  * pass per row.
  *
  * Produces bit-identical values to the composed column form
  * (`Dedup.gramHashes` + `Dedup.minhashSignature`, which remain as the
  * readable spec and are pinned equal by ExpressionsSpec) and therefore
  * to the DuckDB oracle. The composed form runs as interpreted
  * higher-order-function lambdas — expression-tree walks per array
  * element, k passes over the gram array; this one stays inside
  * whole-stage codegen and hand-loops the inner work, which is the
  * difference between the minhash stage being CPU-bound on tree
  * interpretation vs on raw md5.
  *
  * Null/short rows: a document with fewer than n tokens has no gram and
  * yields NULL (callers filter), exactly like the composed form's
  * empty-gram filter.
  */
case class MinhashSig(child: Expression, n: Int, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects a string argument, got ${child.dataType.catalogString}")
    else if (n < 1 || k < 1)
      TypeCheckResult.TypeCheckFailure(s"minhash_sig needs n >= 1 and k >= 1, got n=$n k=$k")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = graft.expressions.MinhashSig.compute($c, $n, $k);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {

  val FnName = "minhash_sig"

  /** Mersenne prime 2^31−1 — the minhash modulus (single source of
    * truth; graft.operators.Dedup aliases these).
    */
  val P: Long = 2147483647L

  /** Polynomial gram-combiner base (mod [[P]]). */
  val B: Long = 1000003L

  /** Deterministic affine family (a_i, b_i), h_i(x) = (a_i·x + b_i)
    * mod p — Knuth multiplicative constants, mirrored verbatim in the
    * DuckDB oracle SQL.
    */
  def coeffs(k: Int): Seq[(Long, Long)] = (0 until k).map { i =>
    val a = (2654435761L * (i + 1)) % P
    val b = ((40503L * 2654435761L) % P * (i + 7)) % P
    (if (a == 0) 1L else a, b)
  }

  private val Ws = Pattern.compile("\\s+")

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val coeffCache = new ConcurrentHashMap[Integer, (Array[Long], Array[Long])]()
  private def coeffArrays(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k, kk => {
      val cs = coeffs(kk)
      (cs.map(_._1).toArray, cs.map(_._2).toArray)
    })

  private val powCache = new ConcurrentHashMap[Integer, Array[Long]]()
  private def powArray(n: Int): Array[Long] =
    powCache.computeIfAbsent(n, nn => {
      // pow(j) = B^(n-1-j) mod p — the factor for gram position j
      val a = new Array[Long](nn)
      var j = nn - 1
      var v = 1L
      while (j >= 0) { a(j) = v; v = v * B % P; j -= 1 }
      a
    })

  /** The full signature for one row; null when the text has no n-gram. */
  def compute(s: UTF8String, n: Int, k: Int): ArrayData = {
    // toLowerCase on UTF8String = Spark's lower(); regex \s+ = Spark's
    // split pattern; empty tokens dropped like functions.tokens
    val toks = Ws.split(s.toLowerCase.toString)
    val md = digest.get()
    var nTok = 0
    var i = 0
    while (i < toks.length) { if (!toks(i).isEmpty) nTok += 1; i += 1 }
    val nGram = nTok - (n - 1)
    if (nGram <= 0) return null
    val th = new Array[Long](nTok)
    i = 0
    var t = 0
    while (i < toks.length) {
      if (!toks(i).isEmpty) {
        md.reset()
        val d = md.digest(toks(i).getBytes(StandardCharsets.UTF_8))
        // first 15 hex nibbles (Md5Long60 semantics), then mod p
        var v = 0L
        var b = 0
        while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        v = (v << 4) | ((d(7) & 0xf0L) >> 4)
        th(t) = v % P
        t += 1
      }
      i += 1
    }
    val pow = powArray(n)
    val (as, bs) = coeffArrays(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var g = 0
    while (g < nGram) {
      // gram hash: Σ_j (th(g+j)·B^(n-1-j) mod p), summed mod p — every
      // intermediate < n·p, the exact arithmetic of Dedup.gramHashes
      var sum = 0L
      var j = 0
      while (j < n) { sum += th(g + j) * pow(j) % P; j += 1 }
      val gh = sum % P
      var x = 0
      while (x < k) {
        val hv = (gh * as(x) + bs(x)) % P
        if (hv < mins(x)) mins(x) = hv
        x += 1
      }
      g += 1
    }
    new GenericArrayData(mins)
  }

  /** The one expression builder — shared by [[register]] and
    * GraftExtensions so the two registration paths can't drift.
    */
  val builder: Seq[Expression] => Expression = exprs =>
    MinhashSig(exprs.head,
      intLiteral(FnName, "n", exprs(1)),
      intLiteral(FnName, "k", exprs(2)))

  /** Clean error for non-constant arity args (a blind eval would
    * surface as an opaque ClassCastException at planning time). Any
    * foldable int expression is accepted — builders run before
    * constant folding, so `2+1` arrives unfolded but evaluable.
    */
  private[expressions] def intLiteral(fn: String, name: String, e: Expression): Int =
    if (e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType)
      e.eval() match {
        case v: Int => v
        case _ => throw new IllegalArgumentException(
          s"$fn: argument '$name' must be a non-null integer constant, got ${e.sql}")
      }
    else throw new IllegalArgumentException(
      s"$fn: argument '$name' must be an integer constant, got ${e.sql}")

  /** Idempotent per-session registration (temp function). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(FnName)))
      reg.createOrReplaceTempFunction(FnName, builder, "built-in")
  }

  /** Column form (Column↔Expression bridges are private[sql] in
    * Spark 4, so this routes through the function registry).
    */
  def apply(c: Column, n: Int, k: Int): Column = {
    register(SparkSession.active)
    call_function(FnName, c, lit(n), lit(k))
  }
}
