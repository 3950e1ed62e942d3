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

/** Per-dimension run table: the sorted kept GLOBAL indices, grouped into
  * runs by containing chunk. `chunkIds(r)` is the dim-chunk id of run r;
  * its kept indices are `kept[offsets(r) until offsets(r+1))`. One table per
  * dimension is shared by EVERY chunk of the scan — O(selected extent), not
  * O(chunks x extent) — and rides to executors inside the reader factory
  * (Spark broadcasts the serialized plan once per executor), so an
  * InputPartition is just an ordinal range: the driver never materializes
  * the chunk grid, and a million-chunk store plans in bounded memory. */
final case class DimRuns(kept: Array[Int], chunkIds: Array[Int], offsets: Array[Int]) {
  def nRuns: Int = chunkIds.length
  def runLen(r: Int): Int = offsets(r + 1) - offsets(r)
}

object DimRuns {
  def fromKept(keptIdxs: Vector[Int], chunkSize: Int): DimRuns = {
    val kept = keptIdxs.toArray
    val chunkIds = scala.collection.mutable.ArrayBuffer[Int]()
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    var prevChunk = -1
    while (i < kept.length) {
      val c = kept(i) / chunkSize
      if (c != prevChunk) { chunkIds += c; offsets += i; prevChunk = c }
      i += 1
    }
    offsets += kept.length
    DimRuns(kept, chunkIds.toArray, offsets.toArray)
  }
}

/** Ordinal range [start, end) over the non-empty chunk grid in C-order
  * (last dim fastest) — two longs, independent of chunk count. */
final case class ZarrInputPartition(start: Long, end: Long) extends InputPartition

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

  private[zarr] lazy val dimRuns: Vector[DimRuns] =
    sel.keep.zipWithIndex.map { case (idxs, d) => DimRuns.fromKept(idxs, meta.chunks(d)) }

  /** Coordinate values aligned with each dim's kept array (output dims
    * only) — shared across all chunks via the reader factory. */
  private lazy val coordVals: Map[Int, Array[Any]] =
    sel.outDims.map(d => d -> dimRuns(d).kept.map(i => coords(d)(i).asInstanceOf[Any])).toMap

  override def planInputPartitions(): Array[InputPartition] = {
    val rank = meta.rank
    if (rank == 0) return Array(ZarrInputPartition(0L, 1L))
    if (dimRuns.exists(_.nRuns == 0)) return Array.empty
    val counts = dimRuns.map(_.nRuns)
    val total = counts.map(_.toLong).product
    // lazy C-order walk over run indices with an incremental cell product —
    // O(1) driver memory per chunk, partitions emitted as ranges fill up
    val parts = scala.collection.mutable.ArrayBuffer[InputPartition]()
    val runIdx = new Array[Int](rank)
    // cells(chunk) = prod_d runLen(d, runIdx(d)); maintain per-dim factors
    val factors = Array.tabulate(rank)(d => dimRuns(d).runLen(0).toLong)
    def cellsNow: Long = { var p = 1L; var d = 0; while (d < rank) { p *= factors(d); d += 1 }; p }
    var start = 0L
    var acc = 0L
    var ord = 0L
    while (ord < total) {
      val c = cellsNow
      if (acc > 0 && acc + c > targetCells) {
        parts += ZarrInputPartition(start, ord)
        start = ord; acc = 0L
      }
      acc += c
      ord += 1
      // odometer over run indices, last dim fastest; update factors in place
      var k = rank - 1
      var carry = true
      while (carry && k >= 0) {
        runIdx(k) += 1
        if (runIdx(k) < counts(k)) carry = false
        else runIdx(k) = 0
        factors(k) = dimRuns(k).runLen(runIdx(k)).toLong
        if (carry) k -= 1
      }
    }
    if (start < total) parts += ZarrInputPartition(start, total)
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // snapshot the driver's hadoop conf for executors — getActiveSession is
    // None inside tasks, so credentials set via spark.hadoop.* would
    // otherwise never reach executor-side chunk reads (cluster mode; local
    // mode masks it by sharing the JVM)
    new ZarrReaderFactory(
      arrayDir,
      meta,
      sel.outDims,
      required,
      ZarrFileIO.executorOptions(storageOptions),
      dimRuns,
      coordVals
    )
}

class ZarrReaderFactory(
    arrayDir: String,
    meta: ZarrArrayMeta,
    outDims: Vector[Int],
    required: StructType,
    storageOptions: Map[String, String],
    dimRuns: Vector[DimRuns],
    coordVals: Map[Int, Array[Any]]
) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ZarrPartitionReader(
      arrayDir,
      meta,
      outDims,
      required,
      partition.asInstanceOf[ZarrInputPartition],
      storageOptions,
      dimRuns,
      coordVals
    )
}

class ZarrPartitionReader(
    arrayDir: String,
    meta: ZarrArrayMeta,
    outDims: Vector[Int],
    required: StructType,
    partition: ZarrInputPartition,
    storageOptions: Map[String, String],
    dimRuns: Vector[DimRuns],
    coordVals: Map[Int, Array[Any]]
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
  private val rank = meta.rank

  private var ordinal: Long = partition.start
  // per-dim state of the CURRENT chunk, derived from the ordinal
  private val runIdx = new Array[Int](rank)
  private val chunkIdx = new Array[Int](rank)
  private val sliceStart = new Array[Int](rank)
  private val sliceLen = new Array[Int](rank)
  private var buf: Option[ZarrBuffer] = None
  private var pos: Array[Int] = new Array[Int](rank) // position INTO the kept slice
  private var havePos = false // pos points at a valid, not-yet-emitted cell
  private var emittedScalar = false // rank-0 single row
  private val row = new GenericInternalRow(required.length)
  private lazy val chunkStrides = IndexMath.strides(meta.chunks)

  private def advanceChunk(): Boolean = {
    if (ordinal >= partition.end) return false
    if (rank == 0) {
      if (emittedScalar) return false
      buf = if (needValue) ZarrChunkIO.readChunk(arrayDir, meta, Seq.empty, storageOptions) else None
      havePos = true
      emittedScalar = true
      ordinal += 1
      return true
    }
    // decompose ordinal (C-order over non-empty chunk grid, last dim fastest)
    var rem = ordinal
    var d = rank - 1
    while (d >= 0) {
      val n = dimRuns(d).nRuns
      runIdx(d) = (rem % n).toInt
      rem /= n
      chunkIdx(d) = dimRuns(d).chunkIds(runIdx(d))
      sliceStart(d) = dimRuns(d).offsets(runIdx(d))
      sliceLen(d) = dimRuns(d).runLen(runIdx(d))
      d -= 1
    }
    buf =
      if (needValue) ZarrChunkIO.readChunk(arrayDir, meta, chunkIdx.toSeq, storageOptions) else None
    java.util.Arrays.fill(pos, 0)
    havePos = true
    ordinal += 1
    true
  }

  override def next(): Boolean = {
    while (!havePos) if (!advanceChunk()) return false
    fillRow()
    advanceOdometer()
    true
  }

  private def fillRow(): Unit = {
    var localFlat = 0L
    if (needValue && rank > 0) {
      var d = 0
      while (d < rank) {
        val g = dimRuns(d).kept(sliceStart(d) + pos(d))
        localFlat += (g - chunkIdx(d) * meta.chunks(d)).toLong * chunkStrides(d)
        d += 1
      }
    }
    var fi = 0
    while (fi < fieldPlan.length) {
      fieldPlan(fi) match {
        case Left(d) => row.update(fi, coordVals(d)(sliceStart(d) + pos(d)))
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

  /** C-order odometer over kept positions of the current chunk. */
  private def advanceOdometer(): Unit = {
    if (rank == 0) { havePos = false; return }
    var k = rank - 1
    var carry = true
    while (carry && k >= 0) {
      pos(k) += 1
      if (pos(k) < sliceLen(k)) carry = false
      else { pos(k) = 0; k -= 1 }
    }
    havePos = !carry
  }

  override def get(): InternalRow = row

  override def close(): Unit = ()
}
