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

/** Compact kept-index set for one dimension (ranges/filter survivors are
  * ascending; explicit user gathers keep their given order).
  * A full or range selection over a 10^8-element dimension is two ints, not
  * a 10^8-element vector — per-dim planning state must stay O(1) for the
  * full-dim common case or the driver itself becomes the scale ceiling. */
sealed trait KeptSet extends Serializable {
  def length: Int
  /** The i-th kept GLOBAL index (0 <= i < length). */
  def apply(i: Int): Int
  def isEmpty: Boolean = length == 0
  def toVector: Vector[Int] = Vector.tabulate(length)(apply)
}
object KeptSet {
  /** Half-open contiguous [start, until). */
  final case class Range(start: Int, until: Int) extends KeptSet {
    def length: Int = math.max(0, until - start)
    def apply(i: Int): Int = start + i
  }
  /** Explicit sorted gather (a filter's surviving indices, a user index
    * list). O(length) memory — the builders below re-compact to Range
    * whenever the survivors happen to be contiguous. */
  final case class Explicit(idx: Array[Int]) extends KeptSet {
    def length: Int = idx.length
    def apply(i: Int): Int = idx(i)
    // Array fields don't get structural equality from the case class
    override def equals(o: Any): Boolean = o match {
      case Explicit(other) => java.util.Arrays.equals(idx, other)
      case _ => false
    }
    override def hashCode(): Int = java.util.Arrays.hashCode(idx)
  }
  /** Build from an index array, compacting to Range ONLY when the indices
    * are consecutive ascending — user gathers preserve their given order
    * (reference list-selection semantics), so `[9, 2, 11]` must stay
    * Explicit even though max-min == length-1. */
  def fromIndices(idx: Array[Int]): KeptSet =
    if (idx.isEmpty) Range(0, 0)
    else {
      var i = 1
      while (i < idx.length && idx(i) == idx(i - 1) + 1) i += 1
      if (i == idx.length) Range(idx.head, idx.last + 1) else Explicit(idx)
    }
}

/** A selection resolved against a concrete shape: per original dimension the
  * kept original indices (C-order preserved), plus which dims are dropped
  * (Point selections). */
final case class ResolvedSelection(
    origShape: Vector[Int],
    keep: Vector[KeptSet],
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
    val keep = Vector.newBuilder[KeptSet]
    val dropped = Vector.newBuilder[Boolean]
    shape.indices.foreach { d =>
      val n = shape(d)
      sel.getOrElse(dims(d), DimSel.All) match {
        case DimSel.All =>
          keep += KeptSet.Range(0, n); dropped += false
        case DimSel.Range(a, b) =>
          val lo = math.max(0, math.min(a, n)); val hi = math.max(lo, math.min(b, n))
          keep += KeptSet.Range(lo, hi); dropped += false
        case DimSel.Point(i) =>
          require(i >= 0 && i < n, s"point $i out of range for dim ${dims(d)} (extent $n)")
          keep += KeptSet.Range(i, i + 1); dropped += true
        case DimSel.Indices(idx) =>
          idx.foreach(i => require(i >= 0 && i < n, s"index $i out of range for dim ${dims(d)} (extent $n)"))
          keep += KeptSet.fromIndices(idx.toArray); dropped += false
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
