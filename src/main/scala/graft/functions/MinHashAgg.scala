package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Single-pass MinHash signature aggregate (SURVEY.md §2.10: the named use
  * case for a custom `TypedImperativeAggregate`). Input: one 64-bit token
  * hash per row; buffer: k running minima of the affine hash family
  * `(a_i * h + b_i) mod p`; output: `array<long>` of length k.
  *
  * The buffer is a primitive long array (no boxing per row) and merges are
  * elementwise minima, so the aggregate is associative + commutative — safe
  * under any partitioning, partial aggregation, and AQE re-planning.
  */
case class MinHashSignature(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(
    k > 0 && k <= graft.operators.Dedup.MinhashMaxK,
    s"minhash_sig: k must be in [1, ${graft.operators.Dedup.MinhashMaxK}] " +
      s"(the size of the splittable affine hash family), got $k"
  )

  // splittable family: first 8 are the oracle-pinned table, the rest are
  // derived deterministically from the index (Dedup.minhashA/minhashB)
  private val as: Array[Long] = Array.tabulate(k)(graft.operators.Dedup.minhashA)
  private val bs: Array[Long] = Array.tabulate(k)(graft.operators.Dedup.minhashB)
  private val p: Long = graft.operators.Dedup.MinhashP2.toLong

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"minhash_sig expects BIGINT, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val x = (as(i) * h + bs(i)) % p
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): MinHashSignature =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSignature =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "minhash_sig"
}

object MinHashAggFunctions {
  def minhashSig(tokenHash: Column, k: Int = 8): Column =
    GraftBridge.column(
      MinHashSignature(GraftBridge.expression(tokenHash), k).toAggregateExpression()
    )
}
