package graft.sources.zarr

import graft.model._
import graft.sources.Coord

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Zarr DataSource V2: `spark.read.format("zarr").option("path", store)
  * .option("array", name).load()` → long-format DataFrame `[dims…, value]`.
  *
  * The architectural inversion vs the reference (SURVEY.md §3.1): the
  * reference materializes the selected numpy block on the driver BEFORE its
  * lazy plan starts (reference: src/data_access/zarr_reader.py:318-322); here
  * the scan stays declarative and chunk reads happen inside executors — one
  * InputPartition covers one or more Zarr chunks, so a 100 TB store is just
  * more partitions, never more driver memory.
  *
  * Pushdown:
  *  - `select.<dim>` options: explicit dimension selection (`a:b` range,
  *    `i` point — drops the column, `i,j,k` gather), mirroring the
  *    reference's `select_dims` (coordinate_processor.py:147-218).
  *  - [[SupportsPushDownFilters]]: coordinate predicates (=, <, <=, >, >=,
  *    IN) on dimension columns are converted to index subsets — the Zarr
  *    analog of partition pruning: chunks with no surviving index are never
  *    opened, let alone decompressed.
  *  - [[SupportsPushDownRequiredColumns]]: unused coordinate columns are
  *    never generated; if `value` itself is pruned (pure coordinate/count
  *    queries) chunk data is never read at all.
  */
class ZarrDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zarr"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrTable.fromOptions(options).schema()

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table =
    ZarrTable.fromOptions(new CaseInsensitiveStringMap(properties))
}

object ZarrTable {
  def parseDimSel(s: String): DimSel = {
    val t = s.trim
    if (t == ":" || t.equalsIgnoreCase("all")) DimSel.All
    else if (t.contains(":")) {
      val parts = t.split(":", -1)
      require(parts.length == 2, s"bad range selection '$s' (want a:b)")
      val a = if (parts(0).isEmpty) 0 else parts(0).toInt
      val b = if (parts(1).isEmpty) Int.MaxValue else parts(1).toInt
      DimSel.Range(a, b)
    } else if (t.contains(",")) DimSel.Indices(t.split(",").map(_.trim.toInt).toVector)
    else DimSel.Point(t.toInt)
  }

  def fromOptions(options: CaseInsensitiveStringMap): ZarrTable = {
    val path = Option(options.get("path"))
      .getOrElse(throw new IllegalArgumentException("zarr source requires option 'path'"))
    val array = Option(options.get("array"))
      .getOrElse(throw new IllegalArgumentException("zarr source requires option 'array'"))
    val group = Option(options.get("group"))
    val consolidated = Option(options.get("consolidated")).map(_.toBoolean)
    // `storage.<key>` options carry s3fs-style store config (see ZarrFileIO).
    // CaseInsensitiveStringMap lower-cases keys; both the s3fs kwarg names
    // and Hadoop fs.* properties are lower-case, so no information is lost.
    val storageOptions: Map[String, String] = options
      .asCaseSensitiveMap()
      .asScala
      .collect { case (k, v) if k.toLowerCase.startsWith("storage.") => k.drop("storage.".length) -> v }
      .toMap
    val store = new ZarrStore(path, storageOptions, group, consolidated)
    val meta = store.arrayMeta(array)
    val sel: Map[String, DimSel] = meta.dims.flatMap { d =>
      Option(options.get(s"select.$d")).map(v => d -> parseDimSel(v))
    }.toMap
    val targetCells = Option(options.get("partition.target.cells")).map(_.toLong).getOrElse(1L << 18)
    new ZarrTable(store, meta, sel, targetCells)
  }
}

class ZarrTable(
    store: ZarrStore,
    meta: ZarrArrayMeta,
    baseSel: Map[String, DimSel],
    targetCells: Long
) extends Table
    with SupportsRead {

  private[zarr] val resolved: ResolvedSelection = Selection.resolve(meta.shape, meta.dims, baseSel)
  private[zarr] lazy val coords: Vector[Coord] =
    meta.dims.zip(meta.shape).map { case (d, n) => store.coordFor(d, n) }

  override def name(): String = s"zarr:${store.storePath}:${meta.name}"

  override def schema(): StructType =
    StructType(
      resolved.outDims.map(d => StructField(meta.dims(d), coords(d).dataType, nullable = false)) :+
        StructField("value", meta.valueType, nullable = true)
    )

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(store, meta, resolved, coords, schema(), targetCells)
}

class ZarrScanBuilder(
    store: ZarrStore,
    meta: ZarrArrayMeta,
    base: ResolvedSelection,
    coords: Vector[Coord],
    fullSchema: StructType,
    targetCells: Long
) extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var keep: Vector[Vector[Int]] = base.keep
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  private def dimIndex(name: String): Option[Int] = {
    val i = meta.dims.indexOf(name)
    // only dims that survive into the schema can be filtered
    if (i >= 0 && base.outDims.contains(i)) Some(i) else None
  }

  private def coordAsDouble(d: Int, idx: Int): Double = coords(d) match {
    case Coord.Ints(a) => a(idx).toDouble
    case Coord.Longs(a) => a(idx).toDouble
    case Coord.Floats(a) => a(idx).toDouble
    case Coord.Doubles(a) => a(idx)
    case Coord.Index(_) => idx.toDouble
  }

  private def num(v: Any): Option[Double] = v match {
    case i: Int => Some(i.toDouble)
    case l: Long => Some(l.toDouble)
    case f: Float => Some(f.toDouble)
    case d: Double => Some(d)
    case s: Short => Some(s.toDouble)
    case b: Byte => Some(b.toDouble)
    case _ => None
  }

  /** Refine the kept-index set of dim `d` by predicate `p` on coord value. */
  private def refine(d: Int, p: Double => Boolean): Unit =
    keep = keep.updated(d, keep(d).filter(i => p(coordAsDouble(d, i))))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filter {
      case EqualTo(a, v) if dimIndex(a).isDefined && num(v).isDefined =>
        refine(dimIndex(a).get, _ == num(v).get); false
      case GreaterThan(a, v) if dimIndex(a).isDefined && num(v).isDefined =>
        refine(dimIndex(a).get, _ > num(v).get); false
      case GreaterThanOrEqual(a, v) if dimIndex(a).isDefined && num(v).isDefined =>
        refine(dimIndex(a).get, _ >= num(v).get); false
      case LessThan(a, v) if dimIndex(a).isDefined && num(v).isDefined =>
        refine(dimIndex(a).get, _ < num(v).get); false
      case LessThanOrEqual(a, v) if dimIndex(a).isDefined && num(v).isDefined =>
        refine(dimIndex(a).get, _ <= num(v).get); false
      case In(a, vs) if dimIndex(a).isDefined && vs.forall(num(_).isDefined) =>
        val set = vs.flatMap(num).toSet
        refine(dimIndex(a).get, set.contains); false
      case _ => true
    }
    accepted = filters.diff(residual)
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new ZarrScan(
      store.arrayDir(meta.name),
      meta,
      base.copy(keep = keep),
      coords,
      required,
      targetCells,
      store.storageOptions
    )
}

/** Per-chunk work item: the chunk id plus, per dimension, the kept GLOBAL
  * indices that fall inside this chunk, and coordinate-value slices for the
  * output dims (small — bounded by chunk extents, so task closures stay
  * tiny no matter how large the store is). */
final case class ChunkWork(
    chunkIdx: Vector[Int],
    kept: Vector[Array[Int]],
    coordSlices: Map[Int, Array[Any]]
) extends Serializable {
  def cells: Long = kept.map(_.length.toLong).product
}

final case class ZarrInputPartition(chunks: Seq[ChunkWork]) extends InputPartition

class ZarrScan(
    arrayDir: String,
    meta: ZarrArrayMeta,
    sel: ResolvedSelection,
    coords: Vector[Coord],
    required: StructType,
    targetCells: Long,
    storageOptions: Map[String, String] = Map.empty
) extends Scan
    with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"ZarrScan(${meta.name}, cells=${sel.keep.map(_.length.toLong).product}, schema=${required.fieldNames.mkString(",")})"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val rank = meta.rank
    if (rank == 0) {
      val w = ChunkWork(Vector.empty, Vector.empty, Map.empty)
      return Array(ZarrInputPartition(Seq(w)))
    }
    // per dim: chunkId -> kept global indices in that chunk (ordered)
    val perDim: Vector[Seq[(Int, Array[Int])]] = sel.keep.zipWithIndex.map { case (idxs, d) =>
      idxs.groupBy(_ / meta.chunks(d)).toSeq.sortBy(_._1).map { case (c, v) => (c, v.toArray) }
    }
    if (perDim.exists(_.isEmpty)) return Array.empty
    // cartesian product of per-dim chunk entries
    var works = List(List.empty[(Int, Array[Int])])
    perDim.foreach { dimEntries =>
      works = for (w <- works; e <- dimEntries) yield e :: w
    }
    val outDimSet = sel.outDims.toSet
    val all = works.map { rev =>
      val entries = rev.reverse.toVector
      val kept = entries.map(_._2)
      val slices: Map[Int, Array[Any]] = outDimSet.map { d =>
        d -> kept(d).map(i => coords(d)(i).asInstanceOf[Any])
      }.toMap
      ChunkWork(entries.map(_._1), kept, slices)
    }
    // greedy coalesce into partitions of ~targetCells
    val parts = scala.collection.mutable.ArrayBuffer[ZarrInputPartition]()
    var cur = scala.collection.mutable.ArrayBuffer[ChunkWork]()
    var curCells = 0L
    all.foreach { w =>
      if (curCells > 0 && curCells + w.cells > targetCells) {
        parts += ZarrInputPartition(cur.toSeq); cur = scala.collection.mutable.ArrayBuffer(); curCells = 0
      }
      cur += w; curCells += w.cells
    }
    if (cur.nonEmpty) parts += ZarrInputPartition(cur.toSeq)
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZarrReaderFactory(arrayDir, meta, sel.outDims, required, storageOptions)
}

class ZarrReaderFactory(
    arrayDir: String,
    meta: ZarrArrayMeta,
    outDims: Vector[Int],
    required: StructType,
    storageOptions: Map[String, String]
) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ZarrPartitionReader(arrayDir, meta, outDims, required, partition.asInstanceOf[ZarrInputPartition], storageOptions)
}

class ZarrPartitionReader(
    arrayDir: String,
    meta: ZarrArrayMeta,
    outDims: Vector[Int],
    required: StructType,
    partition: ZarrInputPartition,
    storageOptions: Map[String, String]
) extends PartitionReader[InternalRow] {

  // field plan: for each required field, either a coord dim or the value
  private val fieldPlan: Array[Either[Int, Unit]] = required.fields.map { f =>
    if (f.name == "value") Right(())
    else Left(outDims.find(d => meta.dims(d) == f.name).getOrElse(
      throw new IllegalArgumentException(s"unknown field ${f.name}")
    ))
  }
  private val needValue = required.fieldNames.contains("value")
  private val fillValue: Option[Double] = meta.fillValue

  private val chunkIter = partition.chunks.iterator
  private var work: ChunkWork = _
  private var buf: Option[ZarrBuffer] = None
  private var pos: Array[Int] = _ // per-dim position INTO kept arrays
  private var havePos = false // pos points at a valid, not-yet-emitted cell
  private val row = new GenericInternalRow(required.length)
  private lazy val chunkStrides = IndexMath.strides(meta.chunks)

  private def advanceChunk(): Boolean = {
    if (!chunkIter.hasNext) return false
    work = chunkIter.next()
    val empty = meta.rank > 0 && work.kept.exists(_.isEmpty)
    if (empty) { havePos = false; return true } // skip, try next chunk
    buf = if (needValue) ZarrChunkIO.readChunk(arrayDir, meta, work.chunkIdx, storageOptions) else None
    pos = new Array[Int](meta.rank)
    havePos = true
    true
  }

  override def next(): Boolean = {
    while (!havePos) if (!advanceChunk()) return false
    fillRow()
    advanceOdometer()
    true
  }

  private def fillRow(): Unit = {
    val rank = meta.rank
    var localFlat = 0L
    if (needValue && rank > 0) {
      var d = 0
      while (d < rank) {
        val g = work.kept(d)(pos(d))
        localFlat += (g - work.chunkIdx(d) * meta.chunks(d)).toLong * chunkStrides(d)
        d += 1
      }
    }
    var fi = 0
    while (fi < fieldPlan.length) {
      fieldPlan(fi) match {
        case Left(d) => row.update(fi, work.coordSlices(d)(pos(d)))
        case Right(_) =>
          val v: Any = buf match {
            case Some(b) => b.getValue(localFlat.toInt)
            case None =>
              fillValue match {
                case Some(f) =>
                  meta.dtype match {
                    case "<i4" => f.toInt
                    case "<i8" => f.toLong
                    case "<f4" => f.toFloat
                    case "<f8" => f
                  }
                case None => null
              }
          }
          row.update(fi, v)
      }
      fi += 1
    }
  }

  /** C-order odometer over kept positions (last dim fastest). */
  private def advanceOdometer(): Unit = {
    val rank = meta.rank
    if (rank == 0) { havePos = false; return }
    var k = rank - 1
    var carry = true
    while (carry && k >= 0) {
      pos(k) += 1
      if (pos(k) < work.kept(k).length) carry = false
      else { pos(k) = 0; k -= 1 }
    }
    havePos = !carry
  }

  override def get(): InternalRow = row

  override def close(): Unit = ()
}
