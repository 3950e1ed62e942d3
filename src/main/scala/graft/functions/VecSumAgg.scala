package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact element-wise vector sum of `array<long>` rows with 128-BIT
  * accumulators — the gradient reducer for
  * [[graft.operators.TextAnalysis.trainLinear]] (SURVEY.md §2.10's
  * custom-`TypedImperativeAggregate` family, beside MinHashSignature and
  * MisraGriesSummary).
  *
  * Why 128 bits: a per-bucket gradient sum `Σ_docs residual·tf` is an
  * int64 product per row (|residual| ≤ 2^(k+2) ≈ 4e6 at the default
  * scale, tf up to document length), so an int64 ACCUMULATOR overflows
  * around ~1e9 documents — exactly the corpus size the trainer targets.
  * Two-limb signed accumulation (hi, lo with unsigned-carry propagation)
  * has no practical ceiling (2^127 ≈ 1.7e38) and matches DuckDB's exact
  * HUGEINT `SUM` bit-for-bit, which is what lets the training loop be
  * replayed as SQL in the oracle.
  *
  * Buffer: primitive `Array[Long]` of 2n interleaved (hi, lo) limb pairs
  * — no boxing per row; update and merge are element-wise limb adds, so
  * the aggregate is associative + commutative: safe under any
  * partitioning, partial (map-side) aggregation, and AQE re-planning.
  * Output: `array<long>` of 2n limbs `[hi_0, lo_0, hi_1, lo_1, ...]`;
  * decode with [[VecAggFunctions.decode128]]. Null rows and null
  * elements are skipped (contribute zero). A row whose array length
  * differs from `n` fails loudly — a silent truncation would corrupt
  * the gradient.
  */
case class VecSum128(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(n > 0 && n <= (1 << 20), s"vec_sum128: n must be in [1, 2^20], got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"vec_sum128 expects ARRAY<BIGINT>, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * n)

  /** buf[2i] += 0 or sign-ext, buf[2i+1] += v with unsigned carry. */
  private def add128(buf: Array[Long], i: Int, v: Long): Unit = {
    val lo = buf(2 * i + 1)
    val newLo = lo + v
    // unsigned carry out of the low limb: standard two-limb formula
    val carry = ((lo & v) | ((lo | v) & ~newLo)) >>> 63
    buf(2 * i) += (v >> 63) + carry
    buf(2 * i + 1) = newLo
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(
        arr.numElements() == n,
        s"vec_sum128: row has ${arr.numElements()} elements, aggregate is sized for $n"
      )
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) add128(buf, i, arr.getLong(i))
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) {
      val lo = a(2 * i + 1)
      val v = b(2 * i + 1)
      val newLo = lo + v
      val carry = ((lo & v) | ((lo | v) & ~newLo)) >>> 63
      a(2 * i) += b(2 * i) + carry
      a(2 * i + 1) = newLo
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(2 * n)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): VecSum128 =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSum128 =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "vec_sum128"
}

object VecAggFunctions {

  /** Exact 128-bit element-wise sum of `array<long>` rows of length `n`;
    * returns 2n interleaved (hi, lo) limbs — see [[VecSum128]]. */
  def vecSum128(arr: Column, n: Int): Column =
    GraftBridge.column(VecSum128(GraftBridge.expression(arr), n).toAggregateExpression())

  /** Decode [[vecSum128]]'s collected limb array back to exact BigInts. */
  def decode128(limbs: collection.Seq[Long]): Array[BigInt] = {
    require(limbs.length % 2 == 0, s"decode128: odd limb count ${limbs.length}")
    val mask = (BigInt(1) << 64) - 1
    Array.tabulate(limbs.length / 2) { i =>
      (BigInt(limbs(2 * i)) << 64) + (BigInt(limbs(2 * i + 1)) & mask)
    }
  }
}
