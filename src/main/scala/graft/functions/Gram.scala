package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `Gram(vec)` — one-pass Gram/covariance sufficient statistics over an
  * integer-quantized vector column: n, per-dimension sums Σxᵢ, and every
  * upper-triangle pair sum Σxᵢxⱼ, as a single AGGREGATE buffer of
  * d(d+3)/2 + 1 longs.
  *
  * This is the scale path for covariance/PCA over embeddings: the naive
  * formulation (posexplode × posexplode, or a d²-wide explode) blows
  * each corpus row up d(d+1)/2× BEFORE aggregation — 2,080 shuffle-input
  * rows per vector at d=64. Here partial aggregation folds each map
  * partition to ONE buffer, the exchange carries O(groups) buffers of
  * ~17 KB, and merge is elementwise addition. The d×d covariance then
  * derives from stat-scale arithmetic on the single output row (the
  * caller's side — see `Similarity.covarianceMatrix`).
  *
  * The child must be `array<long>` — quantize OUTSIDE the aggregate
  * (`transform(embedding, x -> round(x·10⁶))`) so Spark's codegen'd
  * HALF_UP `round` does the float→integer step and the buffer does pure
  * integer sums (order-independent, cross-engine exact; Long holds
  * Σxᵢxⱼ through n·10¹² ≈ 9·10⁶ rows at unit-norm micro scale — beyond
  * that, quantize coarser).
  *
  * All rows must share one dimensionality; nulls (row or element) are
  * skipped whole-row. Output: `struct<n: bigint, comps:
  * array<struct<i:int, s:bigint>>, pairs: array<struct<i:int, j:int,
  * s:bigint>>>` with 1-based i ≤ j.
  */
case class Gram(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  // buffer layout: [0]=d, [1]=n, [2..d+1]=Σxᵢ, then row-major i≤j pairs
  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  private def alloc(d: Int): Array[Long] = new Array[Long](2 + d + d * (d + 1) / 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val d = arr.numElements()
    var i = 0
    while (i < d) { if (arr.isNullAt(i)) return buf; i += 1 }
    val b = if (buf.isEmpty) { val nb = alloc(d); nb(0) = d; nb } else buf
    require(b(0) == d, s"Gram: mixed dimensionality ${b(0)} vs $d")
    b(1) += 1
    val xs = new Array[Long](d)
    i = 0
    while (i < d) { xs(i) = arr.getLong(i); b(2 + i) += xs(i); i += 1 }
    var k = 2 + d
    i = 0
    while (i < d) {
      val xi = xs(i)
      var j = i
      while (j < d) { b(k) += xi * xs(j); j += 1; k += 1 }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    require(a(0) == b(0), s"Gram: mixed dimensionality ${a(0)} vs ${b(0)}")
    var i = 1
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val d = if (buf.isEmpty) 0 else buf(0).toInt
    val n = if (buf.isEmpty) 0L else buf(1)
    val comps = new GenericArrayData((0 until d).map(i =>
      InternalRow(i + 1, buf(2 + i))).toArray[Any])
    val pairRows = new Array[Any](d * (d + 1) / 2)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) { pairRows(k) = InternalRow(i + 1, j + 1, buf(2 + d + k)); j += 1; k += 1 }
      i += 1
    }
    InternalRow(n, comps, new GenericArrayData(pairRows))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("comps", ArrayType(StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("s", LongType, nullable = false))), containsNull = false)),
    StructField("pairs", ArrayType(StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("s", LongType, nullable = false))), containsNull = false))))
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"Gram requires array<bigint> (quantize first), got ${other.catalogString}")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Gram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Gram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Gram =
    copy(child = newChild)
}

object Gram {
  /** Aggregate column over a pre-quantized `array<long>` vector. */
  def gram(vecCol: Column): Column =
    GraftExpressionBridge.column(
      Gram(GraftExpressionBridge.expression(vecCol)).toAggregateExpression())
}
