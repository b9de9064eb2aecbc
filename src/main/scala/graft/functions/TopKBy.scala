package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** `TopKBy(struct(ordFields..., payloadFields...), k)` — exact per-group
  * top-k as an AGGREGATE: returns the k largest input structs under the
  * struct's lexicographic ordering, descending.
  *
  * This is the scale-path alternative to the `row_number() OVER
  * (PARTITION BY g ORDER BY ...) <= k` window (SURVEY W1/§4.2): the
  * window shuffles and SORTS every row of every group; this aggregate
  * keeps a bounded k-element min-heap per group, so partial aggregation
  * reduces each map partition to ≤k rows per group before the shuffle —
  * the exchange carries O(groups·k) rows instead of O(all rows), and
  * nothing is ever globally sorted. For a corpus-scale group (one hot
  * key with billions of rows) the window formulation concentrates the
  * whole group in one task's sort; this aggregate's per-partition heaps
  * stay O(k) memory regardless of group size.
  *
  * Determinism: callers encode tiebreaks INTO the struct (e.g.
  * `struct(score, -id)`) so the ordering is total — same contract as the
  * `max_by` total-ordering pattern in q06.
  */
case class TopKBy(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]]
  with UnaryLike[Expression] {

  require(k >= 1, "k must be >= 1")

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  // min-heap (reverse of desc result order): the root is the WORST of the
  // kept k, evicted when something better arrives
  private def newHeap: mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty[Any](ord.reverse)

  override def createAggregationBuffer(): mutable.PriorityQueue[Any] = newHeap

  override def update(buf: mutable.PriorityQueue[Any], input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) {
      if (buf.size < k) {
        // UnsafeRow values alias the scan's reused buffer — copy to own
        buf.enqueue(v.asInstanceOf[InternalRow].copy())
      } else if (ord.compare(v, buf.head) > 0) {
        buf.dequeue()
        buf.enqueue(v.asInstanceOf[InternalRow].copy())
      }
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[Any], b: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    b.foreach { v =>
      if (a.size < k) a.enqueue(v)
      else if (ord.compare(v, a.head) > 0) { a.dequeue(); a.enqueue(v) }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ord.reverse))

  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] =
    serProj(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val heap = newHeap
    val n = arr.numElements()
    val structType = child.dataType.asInstanceOf[StructType]
    var i = 0
    while (i < n) {
      heap.enqueue(arr.getStruct(i, structType.size).copy())
      i += 1
    }
    heap
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // RowOrdering.isOrderable, not getInterpretedOrdering != null: the
    // latter never returns null (orderings are built lazily and only fail
    // on first compare), so a struct with an unorderable field (e.g. a
    // map) would pass analysis and blow up mid-execution instead
    case s: StructType
        if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"TopKBy requires an orderable struct child, got ${other.catalogString}")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKBy =
    copy(child = newChild)
}

object TopKBy {
  /** Aggregate column: array of the k largest `struct` values, descending
    * by the struct's lexicographic order. Encode tiebreaks in the struct.
    */
  def topKBy(structCol: Column, k: Int): Column =
    GraftExpressionBridge.column(
      TopKBy(GraftExpressionBridge.expression(structCol), k)
        .toAggregateExpression())
}
