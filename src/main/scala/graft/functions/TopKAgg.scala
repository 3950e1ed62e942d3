package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded grouped top-k aggregate: keeps the k LARGEST struct values per
  * group under the struct's natural (field-by-field) ordering — put the
  * ranking column first and tie-breaking id columns after it for
  * deterministic results.
  *
  * This is the scale-correct grouped top-k: `row_number() OVER (PARTITION
  * BY key ORDER BY ...) <= k` sorts EVERY row of every group after a full
  * shuffle, while this aggregate keeps a k-element min-heap per group on
  * the map side, so at most k rows per group per partition cross the wire
  * and nothing is ever globally sorted. Associative + commutative (merge =
  * heap union), so safe under partial aggregation and AQE.
  *
  * Output: `array<struct>` sorted descending (rank order).
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, s"top_k_structs: k must be positive, got $k")

  private lazy val structType: StructType = child.dataType.asInstanceOf[StructType]
  // ascending interpreted ordering over the struct; heap head = smallest kept
  private lazy val ordering: Ordering[InternalRow] =
    GraftBridge.interpretedOrdering(structType).asInstanceOf[Ordering[InternalRow]]
  private lazy val toUnsafe: UnsafeProjection = UnsafeProjection.create(structType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType
        if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s) =>
      TypeCheckResult.TypeCheckSuccess
    case s: StructType =>
      // fail at analysis, not mid-job in an executor's interpreted ordering
      TypeCheckResult.TypeCheckFailure(
        s"top_k_structs requires an orderable struct (no map fields), got ${s.sql}"
      )
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"top_k_structs expects a struct argument (rank field first), got ${other.sql}"
      )
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](ordering.reverse) // min-heap

  override def update(
      buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow
  ): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buf.size < k) buf.enqueue(toUnsafe(row).copy())
      else if (ordering.compare(row, buf.head) > 0) {
        buf.dequeue()
        buf.enqueue(toUnsafe(row).copy())
      }
    }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[InternalRow],
      b: mutable.PriorityQueue[InternalRow]
  ): mutable.PriorityQueue[InternalRow] = {
    b.foreach { row =>
      if (a.size < k) a.enqueue(row)
      else if (ordering.compare(row, a.head) > 0) { a.dequeue(); a.enqueue(row) }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(ordering.reverse).map(identity[Any]))

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = buf.toArray.map(_.asInstanceOf[UnsafeRow])
    val total = 4 + rows.map(4 + _.getSizeInBytes).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { r =>
      bb.putInt(r.getSizeInBytes)
      r.writeTo(bb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val size = bb.getInt
      val rowBytes = new Array[Byte](size)
      bb.get(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, size)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): TopKStructs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStructs =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "top_k_structs"
}

object TopKAggFunctions {
  /** Top-k struct values per group, descending. Put the ranking column as
    * the struct's FIRST field and deterministic tie-breakers after it. */
  def topKStructs(packed: Column, k: Int): Column =
    GraftBridge.column(
      TopKStructs(GraftBridge.expression(packed), k).toAggregateExpression()
    )
}
