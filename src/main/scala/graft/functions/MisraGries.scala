package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `MisraGries(item, capacity)` — one-pass bounded-memory heavy hitters
  * as an AGGREGATE: at most `capacity` counters per group, returning
  * `array<struct<item: string, count_lower: bigint>>` sorted by
  * (count_lower DESC, item ASC).
  *
  * Guarantees (the classic Misra-Gries bounds, spec-pinned):
  *  - `count_lower ≤ true_count ≤ count_lower + n/(capacity+1)` where n
  *    is the group's total item count — every item with frequency above
  *    n/(capacity+1) is PRESENT in the summary;
  *  - when `capacity ≥` the group's distinct-item count, no decrement
  *    ever fires anywhere (update or merge) and every count is EXACT —
  *    which is what makes a SQL oracle possible at the gate SF.
  *
  * Scale story: the 100 TB alternative to `groupBy(item).count()` +
  * top-k when the item domain itself is too large to shuffle — partial
  * aggregation reduces each map partition to ≤ capacity counters per
  * group, the exchange carries O(groups · capacity) rows, and merge is
  * the standard summary merge (add counts, then subtract the
  * (capacity+1)-th largest value so at most `capacity` survive — error
  * bounds compose additively across merges).
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, "capacity must be >= 1")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < capacity =>
          buf.update(s.copy(), 1L) // input UTF8String aliases scan buffers
        case None =>
          // decrement-all: the arriving item and one unit of every
          // counter cancel; zeros leave so a later arrival can enter
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.foreach { case (k, c) =>
            if (c == 1L) dead += k else buf.update(k, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[UTF8String, Long],
      b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything:
      // ties with it hit zero and leave, so at most `capacity` survive
      val counts = a.values.toArray.sorted(Ordering.Long.reverse)
      val d = counts(capacity)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      a.foreach { case (k, c) =>
        if (c - d <= 0L) dead += k else a.update(k, c - d)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) => InternalRow(k, c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("count_lower", LongType))), containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"MisraGries requires a string child, got ${other.catalogString}")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** Aggregate column: bounded-memory heavy-hitter summary of a string
    * column — `array<struct<item, count_lower>>`, (count DESC, item).
    */
  def misraGries(itemCol: Column, capacity: Int): Column =
    GraftExpressionBridge.column(
      MisraGries(GraftExpressionBridge.expression(itemCol), capacity)
        .toAggregateExpression())
}
