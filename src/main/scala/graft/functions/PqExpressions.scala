package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization kernels (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): a `dim`-float
  * vector splits into `m` contiguous subvectors of `dim/m` floats; each
  * subvector is replaced by the index of its nearest (L2) centroid in a
  * per-subspace codebook of `nCen` entries. A vector becomes `m` small
  * ints — 8 codes instead of 64 floats at the fixture shape — and
  * asymmetric distance (query floats vs candidate codes) needs only the
  * codebook to score.
  *
  * The codebook rides the plan inside the expression (the
  * [[BpeTokens]]/rank-table pattern — bounded: `nCen * dim` floats, ~16
  * KB at nCen=16/dim=64/f4, ~64 KB at nCen=256), compiled once per task
  * via `addReferenceObj`; the kernels are tight primitive loops inside
  * whole-stage codegen — no allocation, no boxing, no HOF
  * intermediates (the same reasoning as [[FloatVecDot]]).
  *
  * Determinism contract (the family convention — see [[FloatVecDot]] and
  * PackedArgmax): every accumulation is double left-to-right in index
  * order, subspace distances are rounded to 6 dp with the same HALF_UP
  * decimal rounding as Spark's `round`, and assignment ties break to the
  * SMALLEST code — so an external engine replaying
  * `list_dot_product`-style folds reproduces codes and scores exactly. */
object Pq {

  /** Compiled codebook: flat row-major `[j][c][t]` floats plus the
    * subspace geometry. Built from immutable Seqs so the owning
    * expression keeps value-equality for plan canonicalization. */
  final class Book(cb: Seq[Seq[Seq[Float]]]) extends Serializable {
    require(cb.nonEmpty, "pq codebook: no subspaces")
    val m: Int = cb.length
    val nCen: Int = cb.head.length
    require(nCen >= 1, "pq codebook: empty subspace 0")
    val sub: Int = cb.head.head.length
    require(sub >= 1, "pq codebook: zero-width subvectors")
    cb.zipWithIndex.foreach { case (s, j) =>
      require(
        s.length == nCen && s.forall(_.length == sub),
        s"pq codebook: subspace $j is ragged (expected $nCen x $sub)"
      )
    }
    val dim: Int = m * sub
    /** flat[(j*nCen + c)*sub + t] */
    val flat: Array[Float] = cb.flatten.flatten.toArray
  }

  /** Spark `round(_, 6)` semantics: HALF_UP on the shortest decimal
    * representation of the double (scala BigDecimal(double) ==
    * BigDecimal.valueOf). */
  def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Codes of one vector: per subspace, the index of the L2-nearest
    * centroid (rounded distance, ties to the smallest index). */
  def assign(v: ArrayData, book: Book): GenericArrayData = {
    require(
      v.numElements() == book.dim,
      s"pq_assign: vector has ${v.numElements()} dims, codebook expects ${book.dim}"
    )
    val out = new Array[Any](book.m)
    var j = 0
    while (j < book.m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.nCen) {
        var acc = 0.0
        var t = 0
        val off = (j * book.nCen + c) * book.sub
        while (t < book.sub) {
          val d = v.getFloat(j * book.sub + t).toDouble - book.flat(off + t).toDouble
          acc += d * d
          t += 1
        }
        val r = round6(acc)
        if (r < bestD) { bestD = r; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Reconstructed vector: codebook centroids concatenated by code. */
  def decode(codes: ArrayData, book: Book): GenericArrayData = {
    require(
      codes.numElements() == book.m,
      s"pq_decode: ${codes.numElements()} codes, codebook expects ${book.m}"
    )
    val out = new Array[Any](book.dim)
    var j = 0
    while (j < book.m) {
      val c = codes.getInt(j)
      require(c >= 0 && c < book.nCen, s"pq_decode: code $c out of [0, ${book.nCen}) in subspace $j")
      val off = (j * book.nCen + c) * book.sub
      var t = 0
      while (t < book.sub) { out(j * book.sub + t) = book.flat(off + t); t += 1 }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric dot: query floats x candidate codes, == `vecDot(q,
    * decode(codes))` bit-for-bit (same flat left-to-right double fold)
    * without materializing the reconstruction per pair. */
  def adcDot(q: ArrayData, codes: ArrayData, book: Book): Double = {
    require(
      q.numElements() == book.dim && codes.numElements() == book.m,
      s"pq_adc_dot: query ${q.numElements()} dims / ${codes.numElements()} codes, " +
        s"codebook expects ${book.dim} / ${book.m}"
    )
    var acc = 0.0
    var j = 0
    while (j < book.m) {
      val c = codes.getInt(j)
      require(c >= 0 && c < book.nCen, s"pq_adc_dot: code $c out of [0, ${book.nCen}) in subspace $j")
      val off = (j * book.nCen + c) * book.sub
      var t = 0
      while (t < book.sub) {
        acc += q.getFloat(j * book.sub + t).toDouble * book.flat(off + t).toDouble
        t += 1
      }
      j += 1
    }
    acc
  }
}

/** `pq_assign(vec)` — PQ codes (`array<int>`, length m) of an
  * `array<float>` vector against the embedded codebook. */
case class PqAssign(child: Expression, codebook: Seq[Seq[Seq[Float]]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_assign requires array<float>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val book = new Pq.Book(codebook)

  override def nullSafeEval(input: Any): Any =
    Pq.assign(input.asInstanceOf[ArrayData], book)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", book, classOf[Pq.Book].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.Pq.assign($c, $bookRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_decode(codes)` — reconstructed `array<float>` vector. */
case class PqDecode(child: Expression, codebook: Seq[Seq[Seq[Float]]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_decode requires array<int>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val book = new Pq.Book(codebook)

  override def nullSafeEval(input: Any): Any =
    Pq.decode(input.asInstanceOf[ArrayData], book)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", book, classOf[Pq.Book].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.Pq.decode($c, $bookRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_adc_dot(qvec, codes)` — asymmetric-distance dot product (the hot
  * pair kernel of IVFADC scoring). */
case class PqAdcDot(left: Expression, right: Expression, codebook: Seq[Seq[Seq[Float]]])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_adc_dot requires (array<float>, array<int>), got (${l.sql}, ${r.sql})"
      )
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  @transient private lazy val book = new Pq.Book(codebook)

  override def nullSafeEval(a: Any, b: Any): Any =
    Pq.adcDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], book)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", book, classOf[Pq.Book].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.functions.Pq.adcDot($a, $b, $bookRef);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqFunctions {
  def pqAssign(vec: Column, codebook: Seq[Seq[Seq[Float]]]): Column =
    GraftBridge.column(PqAssign(GraftBridge.expression(vec), codebook))

  def pqDecode(codes: Column, codebook: Seq[Seq[Seq[Float]]]): Column =
    GraftBridge.column(PqDecode(GraftBridge.expression(codes), codebook))

  def pqAdcDot(qvec: Column, codes: Column, codebook: Seq[Seq[Seq[Float]]]): Column =
    GraftBridge.column(PqAdcDot(GraftBridge.expression(qvec), GraftBridge.expression(codes), codebook))
}
