package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType}

/** All-k-probes Bloom membership test over a 60-bit key hash — the
  * compiled hot path of [[graft.operators.Sketches.bloomTest]]: a
  * runtime-filter prune evaluates this once per FACT ROW (3·10⁸
  * probe-ops at gen-sf10's 60M-row scan), and the composed Catalyst
  * form (k × element_at over an array literal + shift/mask, kept as
  * this expression's executable spec in ExpressionsSpec) pays a
  * generic boxed ArrayData access per probe — measured ~12 s per
  * probe per 60M rows, 5× the md5 hash itself. Here the words land
  * ONCE as a primitive long[] codegen reference and the k probes run
  * as a tight branch-out loop.
  *
  * Probe derivation is Kirsch–Mitzenmacher double hashing, shared
  * bit-for-bit with [[graft.operators.Sketches.bloomPos]] and the
  * q245 oracle: h1 = h & (2³⁰−1), h2 = ((h >> 30) & (2³⁰−1))·2 + 1,
  * pos_i = (h1 + i·h2) mod m — all operands non-negative for the
  * 60-bit md5Long domain, so `%` ≡ pmod on both engines.
  *
  * `words`/`mBits`/`kHashes` must be FOLDABLE (the filter's broadcast
  * literal); only the hash is per-row. Null hash → null (the hash of
  * a null key), mirroring the composed form.
  */
case class BloomTestLong(hash: Expression, words: Expression,
    mBits: Expression, kHashes: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(hash, words, mBits, kHashes)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = hash.nullable
  override def prettyName: String = "bloom_test_long"

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(
      s"bloom_test_long: $msg")
    if (hash.dataType != LongType) fail("hash must be bigint")
    else if (!words.dataType.isInstanceOf[ArrayType] ||
      words.dataType.asInstanceOf[ArrayType].elementType != LongType)
      fail("words must be array<bigint>")
    else if (!words.foldable) fail("words must be a literal")
    else if (mBits.dataType != LongType || !mBits.foldable)
      fail("mBits must be a bigint literal")
    else if (!Seq(IntegerType, LongType).contains(kHashes.dataType) ||
      !kHashes.foldable) fail("kHashes must be an integer literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val wordsArr: Array[Long] =
    words.eval().asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val mVal: Long =
    mBits.eval().asInstanceOf[Long]
  @transient private lazy val kVal: Int = kHashes.eval() match {
    case i: Int => i
    case l: Long => l.toInt
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val h = hash.eval(input)
    if (h == null) null
    else BloomTestLong.compute(h.asInstanceOf[Long], wordsArr, mVal, kVal)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    // the words land once as a primitive long[] task reference; the
    // static compute is the generated loop (JIT inlines it), shared
    // with the interpreted path so the two cannot drift
    val wRef = ctx.addReferenceObj("bloomWords", wordsArr, "long[]")
    val hCode = hash.genCode(ctx)
    ev.copy(code = code"""
      ${hCode.code}
      boolean ${ev.isNull} = ${hCode.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${ev.value} = graft.expressions.BloomTestLong.compute(
          ${hCode.value}, $wRef, ${mVal}L, $kVal);
      }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomTestLong =
    copy(hash = newChildren(0), words = newChildren(1),
      mBits = newChildren(2), kHashes = newChildren(3))
}

object BloomTestLong {

  val FnName = "bloom_test_long"

  /** The interpreted twin of the generated loop — and the codegen'd
    * loop's exact shape, so the two paths cannot drift.
    */
  def compute(h: Long, words: Array[Long], m: Long, k: Int): Boolean = {
    val h1 = h & 1073741823L
    val h2 = ((h >>> 30) & 1073741823L) * 2L + 1L
    var i = 0
    while (i < k) {
      val p = (h1 + i.toLong * h2) % m
      if (((words((p >>> 6).toInt) >>> (p & 63L).toInt) & 1L) == 0L)
        return false
      i += 1
    }
    true
  }

  /** The one expression builder — shared by [[register]] and
    * GraftExtensions so the two registration paths can't drift.
    */
  val builder: Seq[Expression] => Expression =
    exprs => BloomTestLong(exprs.head, exprs(1), exprs(2), exprs(3))

  /** Idempotent per-session registration (temp function). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(FnName)))
      reg.createOrReplaceTempFunction(FnName, builder, "built-in")
  }

  /** Column form (Column↔Expression bridges are private[sql] in
    * Spark 4, so this routes through the function registry).
    */
  def apply(hash: Column, words: Column, mBits: Column,
      kHashes: Column): Column = {
    register(SparkSession.active)
    call_function(FnName, hash, words, mBits, kHashes)
  }
}
