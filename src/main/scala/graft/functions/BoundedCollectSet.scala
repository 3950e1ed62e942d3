package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `collect_set` with an executor-side cardinality bound: the accumulating
  * task FAILS with a clear message the moment any partial set exceeds
  * `maxSize`, instead of materializing an unbounded set in the agg buffer
  * and OOM-ing the executor (or, worse, the driver at collect time).
  *
  * This is the safe spelling of "gather a driver-boundable axis in one
  * pass": [[graft.sources.zarr.ZarrSink]] aggregates ALL dimension columns'
  * distinct values in a single job (one input scan, map-side partial
  * merge), and a runaway high-cardinality dimension — the one input shape
  * that must never reach the driver — dies in the first map task that sees
  * `maxSize + 1` distinct values, long before anything is collected.
  *
  * Associative + commutative (merge = set union, bound re-checked), so safe
  * under partial aggregation and AQE. Null inputs are skipped, matching
  * `collect_set`. `-0.0` is normalized to `0.0` (float/double children) so
  * the set semantics match Spark's own groupBy/distinct float
  * normalization.
  */
case class BoundedCollectSet(
    child: Expression,
    maxSize: Int,
    errorHint: String = "",
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashSet[Any]] {

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

  private def overflow(): Nothing =
    throw new IllegalStateException(
      s"bounded_collect_set: more than $maxSize distinct values" +
        (if (errorHint.nonEmpty) s" — $errorHint" else "")
    )

  override def createAggregationBuffer(): mutable.HashSet[Any] = mutable.HashSet.empty[Any]

  override def update(buf: mutable.HashSet[Any], input: InternalRow): mutable.HashSet[Any] = {
    val v = child.eval(input)
    if (v != null && buf.add(normalize(v)) && buf.size > maxSize) overflow()
    buf
  }

  override def merge(a: mutable.HashSet[Any], b: mutable.HashSet[Any]): mutable.HashSet[Any] = {
    b.foreach { v => if (a.add(v) && a.size > maxSize) overflow() }
    a
  }

  override def eval(buf: mutable.HashSet[Any]): Any = new GenericArrayData(buf.toArray)

  // partial-state wire format: one UnsafeRow holding the set as an array
  // (the same shape catalyst's own Collect uses)
  private lazy val serProj: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: mutable.HashSet[Any]): Array[Byte] =
    serProj(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    arr.toObjectArray(child.dataType).foreach(v => buf.add(normalize(v)))
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bounded_collect_set"
}
