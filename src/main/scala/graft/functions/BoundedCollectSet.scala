package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable agg state: the accumulating set, or the overflow marker. Once
  * overflowed the set is CLEARED — state stays O(maxSize) bounded no matter
  * how many more values stream through. */
final class BoundedSetBuf(
    val set: mutable.HashSet[Any] = mutable.HashSet.empty,
    var overflowed: Boolean = false
)

/** `collect_set` with an executor-side cardinality bound. Two modes:
  *
  *  - `failOnOverflow = true` (default): the accumulating task FAILS with a
  *    clear message the moment any partial set exceeds `maxSize`, instead
  *    of materializing an unbounded set in the agg buffer and OOM-ing the
  *    executor (or, worse, the driver at collect time).
  *  - `failOnOverflow = false`: overflow degrades to a NULL result (the
  *    buffer clears itself, staying bounded) — the caller learns "this
  *    column is not driver-boundable" from one flag and can route to a
  *    distributed path instead. [[graft.sources.zarr.ZarrSink]] uses this
  *    to keep its one-job coordinate gather for normal axes while long
  *    axes fall through to sort-based ordinal assignment.
  *
  * Associative + commutative (merge = set union, bound re-checked; overflow
  * is absorbing), so safe under partial aggregation and AQE. Null inputs
  * are skipped, matching `collect_set`. `-0.0` is normalized to `0.0`
  * (float/double children) so the set semantics match Spark's own
  * groupBy/distinct float normalization.
  */
case class BoundedCollectSet(
    child: Expression,
    maxSize: Int,
    errorHint: String = "",
    failOnOverflow: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[BoundedSetBuf] {

  require(maxSize > 0, s"bounded_collect_set: maxSize must be positive, got $maxSize")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // BinaryType values surface as Array[Byte], which HashSet compares by
    // reference — no dedup would occur, just spurious overflows
    case _: ArrayType | _: MapType | _: StructType | _: BinaryType =>
      TypeCheckResult.TypeCheckFailure(
        s"bounded_collect_set expects an atomic-typed argument, got ${child.dataType.sql}"
      )
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  private def normalize(v: Any): Any = v match {
    case d: java.lang.Double if d.doubleValue() == 0.0 => java.lang.Double.valueOf(0.0)
    case f: java.lang.Float if f.floatValue() == 0.0f => java.lang.Float.valueOf(0.0f)
    case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
    case other => other
  }

  private def overflow(buf: BoundedSetBuf): Unit =
    if (failOnOverflow)
      throw new IllegalStateException(
        s"bounded_collect_set: more than $maxSize distinct values" +
          (if (errorHint.nonEmpty) s" — $errorHint" else "")
      )
    else {
      buf.set.clear()
      buf.overflowed = true
    }

  override def createAggregationBuffer(): BoundedSetBuf = new BoundedSetBuf()

  override def update(buf: BoundedSetBuf, input: InternalRow): BoundedSetBuf = {
    if (!buf.overflowed) {
      val v = child.eval(input)
      if (v != null && buf.set.add(normalize(v)) && buf.set.size > maxSize) overflow(buf)
    }
    buf
  }

  override def merge(a: BoundedSetBuf, b: BoundedSetBuf): BoundedSetBuf = {
    if (b.overflowed) overflow(a)
    if (!a.overflowed) {
      val it = b.set.iterator
      while (it.hasNext && !a.overflowed) {
        if (a.set.add(it.next()) && a.set.size > maxSize) overflow(a)
      }
    }
    a
  }

  override def eval(buf: BoundedSetBuf): Any =
    if (buf.overflowed) null else new GenericArrayData(buf.set.toArray)

  // partial-state wire format: one UnsafeRow holding the set as an array
  // (the same shape catalyst's own Collect uses); null array = overflowed
  private lazy val serProj: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: BoundedSetBuf): Array[Byte] = {
    val arr = if (buf.overflowed) null else new GenericArrayData(buf.set.toArray)
    serProj(InternalRow(arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): BoundedSetBuf = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val buf = createAggregationBuffer()
    if (row.isNullAt(0)) buf.overflowed = true
    else row.getArray(0).toObjectArray(child.dataType).foreach(v => buf.set.add(normalize(v)))
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = !failOnOverflow
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bounded_collect_set"
}
