package graft.expressions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Bounded-state top-k aggregate buffer: (value, id) pairs kept sorted
  * (value desc, id asc), never more than k of them. Insertion is a
  * linear scan — k is small by contract (a result page, not a table).
  */
final class TopKPairsBuffer(val k: Int) {
  val vs = new ArrayBuffer[Long](k + 1)
  val ids = new ArrayBuffer[Long](k + 1)

  def insert(v: Long, id: Long): Unit = {
    if (vs.length == k && {
      val lv = vs(k - 1)
      lv > v || (lv == v && ids(k - 1) < id)
    }) return // cheap reject: below the current floor
    var i = 0
    while (i < vs.length && (vs(i) > v || (vs(i) == v && ids(i) < id))) i += 1
    vs.insert(i, v); ids.insert(i, id)
    if (vs.length > k) { vs.remove(k); ids.remove(k) }
  }
}

/** Per-group top-k as a native `TypedImperativeAggregate` — the
  * scale-correct form of "top k rows per group". The window
  * formulation (`row_number` over the group) shuffles and sorts EVERY
  * row; this aggregate keeps at most k (value, id) pairs per group in
  * its partial state, so the map side combines before the shuffle and
  * only |groups|·k pairs ever move. Returns array<struct<v, id>>
  * sorted (v desc, id asc) — `posexplode` turns it back into ranked
  * rows. Null value/id inputs are skipped (no rank).
  */
case class TopKPairs(valueExpr: Expression, idExpr: Expression, kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(valueExpr, idExpr, kExpr)
  override def nullable: Boolean = false
  override def prettyName: String = TopKPairs.FnName
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("k must be a literal")
    else if (valueExpr.dataType != LongType || idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"${TopKPairs.FnName} expects (bigint, bigint, int), got " +
          s"(${valueExpr.dataType.catalogString}, ${idExpr.dataType.catalogString})")
    else if (k <= 0) TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKPairsBuffer = new TopKPairsBuffer(k)

  override def update(b: TopKPairsBuffer, input: InternalRow): TopKPairsBuffer = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      b.insert(v.asInstanceOf[Long], id.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKPairsBuffer, o: TopKPairsBuffer): TopKPairsBuffer = {
    var i = 0
    while (i < o.vs.length) { b.insert(o.vs(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKPairsBuffer): Any =
    new GenericArrayData(
      (0 until b.vs.length).map(i => InternalRow(b.vs(i), b.ids(i))).toArray[Any])

  override def serialize(b: TopKPairsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 16 * b.vs.length)
    val out = new DataOutputStream(bos)
    out.writeInt(b.k); out.writeInt(b.vs.length)
    var i = 0
    while (i < b.vs.length) { out.writeLong(b.vs(i)); out.writeLong(b.ids(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val in = ByteBuffer.wrap(bytes)
    val b = new TopKPairsBuffer(in.getInt)
    val n = in.getInt
    var i = 0
    // pairs were serialized in sorted order — append, don't re-scan
    while (i < n) { b.vs += in.getLong; b.ids += in.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}

object TopKPairs {

  val FnName = "graft_topk"

  val builder: Seq[Expression] => Expression =
    exprs => TopKPairs(exprs(0), exprs(1), exprs(2))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(FnName)))
      reg.createOrReplaceTempFunction(FnName, builder, "built-in")
  }

  /** Column form: top `k` (value, id) pairs per group. */
  def apply(value: Column, id: Column, k: Int): Column = {
    register(SparkSession.active)
    call_function(FnName, value, id, lit(k))
  }
}
