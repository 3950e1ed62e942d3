package graft.model

/** Dimension-selection model.
  *
  * Re-expresses the reference's read-time dimension selection semantics
  * (reference: src/data_access/coordinate_processor.py:147-218): per dimension
  * a user may give a half-open range (python `slice(a,b)`), a single point
  * (python `int` — the dimension is dropped from the output schema), or an
  * explicit index list (python `list[int]`). Unselected dimensions keep all
  * indices (python `slice(None)`).
  */
sealed trait DimSel
object DimSel {
  /** Half-open `[start, until)` range; clamped to the dim extent. */
  final case class Range(start: Int, until: Int) extends DimSel

  /** Single index — selects one coordinate and drops the dimension column
    * (reference: coordinate_processor.py:193-196). */
  final case class Point(i: Int) extends DimSel

  /** Explicit index gather. */
  final case class Indices(idx: Vector[Int]) extends DimSel

  /** Keep everything (python `slice(None)`). */
  case object All extends DimSel
}

/** A selection resolved against a concrete shape: per original dimension the
  * kept original indices (C-order preserved), plus which dims are dropped
  * (Point selections). */
final case class ResolvedSelection(
    origShape: Vector[Int],
    keep: Vector[Vector[Int]],
    dropped: Vector[Boolean]
) {
  require(origShape.length == keep.length && keep.length == dropped.length)
  /** Shape of the selected block (dropped dims have extent 1 here). */
  val selShape: Vector[Int] = keep.map(_.length)
  /** Indices of dims that survive into the output schema. */
  val outDims: Vector[Int] = dropped.zipWithIndex.collect { case (false, i) => i }
  def totalCells: Long = selShape.map(_.toLong).product
}

object Selection {
  /** Resolve a per-dim-name selection map against (shape, dims).
    * Unknown names are ignored (mirrors the reference, which only applies
    * selections for known dims). Out-of-range ranges clamp; out-of-range
    * points/indices throw. */
  def resolve(shape: Seq[Int], dims: Seq[String], sel: Map[String, DimSel]): ResolvedSelection = {
    require(shape.length == dims.length, s"shape/dims rank mismatch: $shape vs $dims")
    val keep = Vector.newBuilder[Vector[Int]]
    val dropped = Vector.newBuilder[Boolean]
    shape.indices.foreach { d =>
      val n = shape(d)
      sel.getOrElse(dims(d), DimSel.All) match {
        case DimSel.All =>
          keep += (0 until n).toVector; dropped += false
        case DimSel.Range(a, b) =>
          val lo = math.max(0, math.min(a, n)); val hi = math.max(lo, math.min(b, n))
          keep += (lo until hi).toVector; dropped += false
        case DimSel.Point(i) =>
          require(i >= 0 && i < n, s"point $i out of range for dim ${dims(d)} (extent $n)")
          keep += Vector(i); dropped += true
        case DimSel.Indices(idx) =>
          idx.foreach(i => require(i >= 0 && i < n, s"index $i out of range for dim ${dims(d)} (extent $n)"))
          keep += idx; dropped += false
      }
    }
    ResolvedSelection(shape.toVector, keep.result(), dropped.result())
  }
}

/** Row-major (C-order) flat-index arithmetic — the reference's meshgrid-free
  * coordinate expansion (reference: coordinate_processor.py:279-349; index
  * math at :336-347: last dim `idx % extent`, first `idx / prod(rest)`,
  * middle `(idx / stride) % extent`). Pure functions; property-tested. */
object IndexMath {
  /** C-order strides: strides(i) = product of extents of dims right of i. */
  def strides(shape: Seq[Int]): Array[Long] = {
    val s = new Array[Long](shape.length)
    var acc = 1L
    var i = shape.length - 1
    while (i >= 0) { s(i) = acc; acc *= shape(i); i -= 1 }
    s
  }

  /** Decompose a flat C-order index into per-dim positions (into `out`). */
  def unflatten(flat: Long, shape: Seq[Int], out: Array[Int]): Unit = {
    var rem = flat
    var i = shape.length - 1
    while (i >= 0) { out(i) = (rem % shape(i)).toInt; rem /= shape(i); i -= 1 }
  }

  def flatten(idx: Array[Int], strides: Array[Long]): Long = {
    var acc = 0L
    var i = 0
    while (i < idx.length) { acc += idx(i) * strides(i); i += 1 }
    acc
  }
}
