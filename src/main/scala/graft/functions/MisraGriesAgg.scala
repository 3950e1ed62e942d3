package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequency summary (Misra & Gries 1982), merged with the
  * mergeable-summaries rule of Agarwal et al., PODS 2012: at most `cap`
  * (item, count) counters per buffer. Update: hit → +1; miss with room →
  * insert; miss when full → decrement ALL counters by 1 and drop zeros.
  * Merge: add counts pointwise, then if more than `cap` survive, subtract
  * the (cap+1)-th largest count from every counter and drop non-positives.
  *
  * Guarantee (holds under ANY partitioning / merge tree): every item with
  * true frequency > N/(cap+1) is present in the summary, and each kept
  * estimate undershoots the true count by at most N/(cap+1). The SUMMARY
  * CONTENTS beyond that guarantee are partitioning-dependent — treat it as
  * a candidate superset and recount exactly
  * ([[graft.operators.Relational.heavyHitters]]), never as final counts.
  *
  * Fixed-size state (≤ cap counters) merging map-side — the 100 TB
  * heavy-hitter path: an exact `GROUP BY value` shuffles every distinct
  * value of a possibly-unbounded domain. A miss on a full buffer costs
  * O(cap), so size `cap` to the threshold (ceil(1/phi)), not to the domain.
  * Output: `array<struct<item string, est long>>`, est desc, item asc.
  * Nulls are skipped (not part of the stream).
  */
case class MisraGriesSummary(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(cap > 0, s"mg_summary: cap must be positive, got $cap")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"mg_summary expects a string argument (cast keys first), got ${other.sql}"
      )
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty[UTF8String, Long]

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow
  ): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val u = v.asInstanceOf[UTF8String]
      buf.get(u) match {
        case Some(c) => buf.update(u, c + 1L)
        case None if buf.size < cap => buf.update(u.copy(), 1L)
        case None =>
          // classic MG decrement step: a miss on a full buffer pays one
          // count from every counter (amortized O(1) per stream element)
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.keysIterator.foreach { k =>
            val c = buf(k) - 1L
            if (c <= 0L) dead += k else buf.update(k, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[UTF8String, Long],
      b: mutable.HashMap[UTF8String, Long]
  ): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > cap) {
      // subtract the (cap+1)-th largest count from all; ≤ cap survive
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (cap + 1)) // (cap+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      a.keysIterator.foreach { k =>
        val c = a(k) - cut
        if (c <= 0L) dead += k else a.update(k, c)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val rows = buf.toArray
      .sortWith { case ((k1, c1), (k2, c2)) => // est desc, item asc: deterministic GIVEN the summary
        c1 > c2 || (c1 == c2 && k1.compareTo(k2) < 0)
      }
      .map { case (k, c) =>
        new GenericInternalRow(Array[Any](k, c)): Any
      }
    new GenericArrayData(rows)
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val total = 4 + entries.map { case (k, _) => 4 + k.numBytes() + 8 }.sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(entries.length)
    entries.foreach { case (k, c) =>
      val bytes = k.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.update(UTF8String.fromBytes(kb), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(StructField("item", StringType, nullable = false), StructField("est", LongType, nullable = false))
    ),
    containsNull = false
  )
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesSummary =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesSummary =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "mg_summary"
}

object MgAggFunctions {
  /** Misra–Gries candidate summary: ≤ `cap` (item, est) counters, every
    * item with frequency > N/(cap+1) guaranteed present. Estimates are
    * partitioning-dependent lower bounds — recount before reporting. */
  def mgSummary(value: Column, cap: Int): Column =
    GraftBridge.column(
      MisraGriesSummary(GraftBridge.expression(value), cap).toAggregateExpression()
    )
}
