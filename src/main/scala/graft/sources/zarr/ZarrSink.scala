package graft.sources.zarr

import graft.model.IndexMath

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, GraftBridge, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Zarr v2 write: the inverse of the long-format scan —
  * `df.write.format("zarr")` over a `[dims…, value]` frame produces a
  * chunked store any Zarr reader (including [[ZarrDataSourceV2]]) can open.
  * Completes the source/sink pairing the reference's Parquet sink implies
  * (reference: src/cli.py:158-161 — it can only EXPORT to parquet; writing
  * back to Zarr is the missing half).
  *
  * Scale shape (the part that must survive 100 TB):
  *  - coordinate values are the ONLY driver-side data (sorted distinct per
  *    dim — same bound as the read path's coordFor); cell data never
  *    touches the driver
  *  - each row's target chunk ordinal and in-chunk offset are COLUMN
  *    ARITHMETIC (codegen), so the expensive part of the write plan is one
  *    hash repartition clustered by chunk ordinal + an in-partition sort —
  *    after that every chunk's cells are contiguous in exactly one task
  *  - tasks stream: one dense chunk buffer at a time (fill, set cells,
  *    compress, write via the Hadoop FileSystem), O(1 chunk) memory
  *  - absent cells read back as fill_value; chunks with no rows are never
  *    written (Zarr's native sparse representation)
  *
  * Options: `path`, `array` (required); `group`, `chunks` ("16,16"),
  * `dtype` (numpy spelling, default from the value column type; explicit
  * unsigned targets u1/u2/u4 are honored with per-value range validation —
  * out-of-range input fails loudly instead of masking; StringType values
  * write as vlen-utf8 object arrays; a STRUCT value column writes a
  * structured/compound dtype — the v2 [[name, dtype], ...] list spelling,
  * inferred for numeric fields or given explicitly when fields need fixed
  * string widths; structured fill_value is a base64 packed cell, default
  * all-zero; v2 only), `compressor`
  * ("zlib" | "zstd" | "gzip" | "blosc[:cname[:mode]]" | "none", default
  * blosc:lz4 — the numcodecs default), `fill_value` (default 0; for string
  * values a fill STRING, default ""), `max_coord_values` (per-dim distinct
  * bound for the single-pass coordinate gather, default 10M — a NUMERIC
  * dim past it routes to the distributed long-axis path: sort-based
  * ordinal assignment, shuffle ordinal join, executor-written multi-chunk
  * coordinate arrays), `coord_chunk_values` (cells per long-axis
  * coordinate chunk object, default 1M), `zarr_format` ("2" default |
  * "3" — v3 writes `zarr.json` metadata, `c/`-keys, a bytes+codec
  * pipeline, and with `checksum`=true a trailing crc32c; no datetime64
  * under v3), `shards` (v3 only: cells per SHARD OBJECT per dim, multiples
  * of `chunks` — emits a sharding_indexed store where each task streams
  * one whole shard per PUT; the object-store write shape at scale),
  * `storage.*` (same remote-store options as the scan).
  *
  * Semantics: dim columns are coordinate VALUES (not indices) — numeric,
  * timestamp, or STRING (label axes write as vlen-utf8 coordinate
  * arrays); the sink sorts each dim's distinct values ascending to form
  * the coordinate arrays, so a scanned-then-written store round-trips
  * cell-for-cell. The input must have at most one row per cell (duplicate
  * cells make the written value nondeterministic, as with any
  * last-write-wins sink).
  */
object ZarrSink {

  private[zarr] def dtypeFor(dt: DataType): String = dt match {
    case BooleanType => "|b1"
    case ByteType => "<i1"
    case ShortType => "<i2"
    case IntegerType => "<i4"
    case LongType => "<i8"
    case FloatType => "<f4"
    case DoubleType => "<f8"
    case TimestampType => "<M8[us]"
    case StringType => "|O" // vlen-utf8 object array (v3: data_type "string")
    case st: StructType =>
      // structured (compound) value: the v2 list-of-[name, dtype] spelling.
      // String fields have no inferable fixed width — pass an explicit
      // 'dtype' option naming |S<n>/<U<n> for those.
      st.fields
        .map { f =>
          val fd = f.dataType match {
            case BooleanType => "|b1"
            case ByteType => "<i1"
            case ShortType => "<i2"
            case IntegerType => "<i4"
            case LongType => "<i8"
            case FloatType => "<f4"
            case DoubleType => "<f8"
            case TimestampType => "<M8[us]"
            case other =>
              throw new IllegalArgumentException(
                s"zarr sink: struct field '${f.name}': cannot infer a dtype for $other — " +
                  "pass an explicit 'dtype' option (string fields need a fixed width, e.g. |S8)"
              )
          }
          s"""["${f.name}", "$fd"]"""
        }
        .mkString("[", ", ", "]")
    case other =>
      throw new IllegalArgumentException(
        s"zarr sink: unsupported value column type $other (pass an explicit 'dtype' option for unsigned targets)"
      )
  }

  private def coordDtype(dt: DataType): String = dt match {
    case IntegerType => "<i4"
    case LongType => "<i8"
    case FloatType => "<f4"
    case DoubleType => "<f8"
    case TimestampType => "<M8[us]"
    case StringType => "|O" // label axes write as vlen-utf8 object arrays
    case other =>
      throw new IllegalArgumentException(
        s"zarr sink: dimension columns must be int/long/float/double/timestamp/string, got $other"
      )
  }

  /** Ascending ordering over EXTERNAL row values, matching Spark's own
    * `orderBy` semantics for the supported coordinate types (total float
    * ordering: NaN sorts greatest). Strings compare as UTF-8 BYTES —
    * Spark's StringType sort order — not Java's UTF-16 code units: the two
    * diverge for supplementary-plane characters (emoji labels), and the
    * driver-side axis must sort identically to the distributed long-axis
    * path and to the scan's lexicographic pruning. */
  private[zarr] def externalOrdering(dt: DataType): Ordering[Any] = dt match {
    case IntegerType => Ordering.by((v: Any) => v.asInstanceOf[Int])
    case LongType => Ordering.by((v: Any) => v.asInstanceOf[Long])
    case FloatType => Ordering.by((v: Any) => v.asInstanceOf[Float])(Ordering.Float.TotalOrdering)
    case DoubleType => Ordering.by((v: Any) => v.asInstanceOf[Double])(Ordering.Double.TotalOrdering)
    case TimestampType => Ordering.by((v: Any) => micros(v))
    case StringType =>
      Ordering.by((v: Any) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(v.asInstanceOf[String])
      )
    case _: org.apache.spark.sql.types.DecimalType => // uint64 axes scan as Decimal(20,0)
      Ordering.fromLessThan((a: Any, b: Any) =>
        a.asInstanceOf[java.math.BigDecimal].compareTo(b.asInstanceOf[java.math.BigDecimal]) < 0
      )
    case other => throw new IllegalArgumentException(s"zarr sink: unsupported dimension type $other")
  }

  /** Chunk-grid geometry for stats recording: decomposes a chunk ordinal
    * into its grid position and visits the chunk-local linear index of
    * every IN-SHAPE cell, skipping ragged-edge padding (cells past the
    * array shape in a boundary chunk). Padding cells hold the fill value
    * but are never readable, so including them would widen bounds with a
    * value no query can observe — sound for pruning but WRONG for the
    * scan's stats-only min/max aggregate (it would answer the fill from a
    * store that never contains it). In-shape-only bounds are exact over
    * readable cells, serving both. */
  private[zarr] final case class ChunkGeom(
      shape: Array[Long],
      chunks: Array[Int],
      nChunks: Array[Int]
  ) extends Serializable {
    private val strides: Array[Int] = {
      val r = chunks.length
      val s = new Array[Int](r)
      var acc = 1
      var d = r - 1
      while (d >= 0) { s(d) = acc; acc *= chunks(d); d -= 1 }
      s
    }
    val elems: Int = chunks.product

    def foreachInShape(ordinal: Long)(f: Int => Unit): Unit = {
      val r = chunks.length
      val valid = new Array[Int](r)
      var full = true
      var rem = ordinal
      var d = r - 1
      while (d >= 0) {
        val g = (rem % nChunks(d)).toInt
        rem /= nChunks(d)
        val v = math.min(chunks(d).toLong, shape(d) - g.toLong * chunks(d)).toInt
        valid(d) = v
        if (v != chunks(d)) full = false
        d -= 1
      }
      if (full) {
        var i = 0
        while (i < elems) { f(i); i += 1 }
      } else {
        // odometer over the valid hyper-rectangle, linear index incremental
        val idx = new Array[Int](r)
        var lin = 0
        var done = false
        while (!done) {
          f(lin)
          var d2 = r - 1
          var carry = true
          while (carry && d2 >= 0) {
            idx(d2) += 1
            if (idx(d2) < valid(d2)) { lin += strides(d2); carry = false }
            else { lin -= (valid(d2) - 1) * strides(d2); idx(d2) = 0; d2 -= 1 }
          }
          if (carry) done = true
        }
      }
    }
  }

  /** One flushed chunk's bounds in whichever stats domain applies; unused
    * fields stay at their defaults. */
  private[zarr] final case class ChunkBounds(
      ord: Long,
      has: Boolean,
      loL: Long = 0L,
      hiL: Long = 0L,
      loD: Double = 0.0,
      hiD: Double = 0.0,
      loS: String = null,
      hiS: String = null
  )

  /** Byte-lexicographic [min, max] over a string chunk's IN-SHAPE cells
    * (fill-prefilled, so never null) — the same binary UTF-8 order Spark
    * strings compare in. */
  private[zarr] def stringBoundsRecord(
      ordinal: Long,
      cells: Array[String],
      geom: ChunkGeom
  ): ChunkBounds = {
    var lo: String = null
    var hi: String = null
    var loB: Array[Byte] = null
    var hiB: Array[Byte] = null
    geom.foreachInShape(ordinal) { i =>
      val s = cells(i)
      if (s != null) {
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (lo == null || java.util.Arrays.compareUnsigned(b, loB) < 0) { lo = s; loB = b }
        if (hi == null || java.util.Arrays.compareUnsigned(b, hiB) > 0) { hi = s; hiB = b }
      }
    }
    ChunkBounds(ordinal, has = lo != null, loS = lo, hiS = hi)
  }

  /** [min, max] over every IN-SHAPE cell of a flushed chunk buffer (fill-
    * prefilled sparse cells included — they are readable; ragged-edge
    * padding excluded — it is not, and including it would poison the
    * stats-only min/max aggregate with the fill value, see [[ChunkGeom]]).
    * Long domain converts M8/TD raw units to micros exactly like the read
    * path (NaT cells are null and excluded); double domain orders NaN
    * greatest and normalizes -0.0, matching Spark comparisons. */
  private[zarr] def chunkBoundsRecord(
      ordinal: Long,
      dt: ZDtype,
      buf: ByteBuffer,
      geom: ChunkGeom,
      intDomain: Boolean
  ): ChunkBounds =
    if (intDomain) {
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var any = false
      geom.foreachInShape(ordinal) { i =>
        var skip = false
        val v: Long = dt.code match {
          case ZDtype.BOOL | ZDtype.I1 => buf.get(i).toLong
          case ZDtype.U1 => (buf.get(i) & 0xff).toLong
          case ZDtype.I2 => buf.getShort(i * 2).toLong
          case ZDtype.U2 => (buf.getShort(i * 2) & 0xffff).toLong
          case ZDtype.I4 => buf.getInt(i * 4).toLong
          case ZDtype.U4 => buf.getInt(i * 4) & 0xffffffffL
          case ZDtype.I8 => buf.getLong(i * 8)
          case ZDtype.M8 | ZDtype.TD =>
            val raw = buf.getLong(i * 8)
            if (raw == ZDtype.NaT) { skip = true; 0L }
            else raw * dt.m8Num / dt.m8Den
          case other => throw new IllegalStateException(s"stats domain int for dtype code $other")
        }
        if (!skip) { any = true; if (v < mn) mn = v; if (v > mx) mx = v }
      }
      ChunkBounds(ordinal, any, loL = mn, hiL = mx)
    } else {
      var mn = Double.NaN
      var mx = Double.NaN
      var any = false
      geom.foreachInShape(ordinal) { i =>
        val v: Double = ZarrChunkStats.norm(dt.code match {
          case ZDtype.F2 => ZDtype.halfToFloat(buf.getShort(i * 2)).toDouble
          case ZDtype.F4 => buf.getFloat(i * 4).toDouble
          case ZDtype.F8 => buf.getDouble(i * 8)
          case other => throw new IllegalStateException(s"stats domain float for dtype code $other")
        })
        if (!any) { mn = v; mx = v; any = true }
        else {
          if (java.lang.Double.compare(v, mn) < 0) mn = v
          if (java.lang.Double.compare(v, mx) > 0) mx = v
        }
      }
      ChunkBounds(ordinal, any, loD = mn, hiD = mx)
    }

  /** Encode one row's value into a chunk buffer — shared by the per-chunk
    * and per-shard executor loops. Unsigned range validation fails loudly
    * instead of masking. */
  private[zarr] def putCell(
      dt: ZDtype,
      buf: ByteBuffer,
      local: Int,
      v: Any,
      rCheck: Boolean,
      rMin: Long,
      rMax: Long,
      dtypeStr: String
  ): Unit = {
    def checkedLong(x: Long): Long = {
      if (rCheck && (x < rMin || x > rMax))
        throw new IllegalArgumentException(
          s"zarr sink: value $x out of range for unsigned dtype '$dtypeStr' [$rMin, $rMax]"
        )
      x
    }
    def checkedDouble(x: Double): Double = {
      if (rCheck && (x.isNaN || x < rMin || x > rMax))
        throw new IllegalArgumentException(
          s"zarr sink: value $x out of range for unsigned dtype '$dtypeStr' [$rMin, $rMax]"
        )
      x
    }
    v match {
      case null => () // absent value -> fill
      case row: org.apache.spark.sql.Row if dt.code == ZDtype.V =>
        // structured cell: pack each field at its offset (zarr has no
        // per-field null — a null field fails loudly, never writes garbage)
        require(
          row.length == dt.fields.length,
          s"zarr sink: struct value has ${row.length} fields, dtype '$dtypeStr' has ${dt.fields.length}"
        )
        val base = local * dt.itemSize
        var f = 0
        while (f < dt.fields.length) {
          val fv = row.get(f)
          require(fv != null, s"zarr sink: struct field '${dt.fields(f)._1}' is NULL — zarr cells have no per-field null")
          ZarrStoreWriter.packStructField(buf, base + dt.fieldOffsets(f), dt.fields(f)._2, fv)
          f += 1
        }
      case b: java.lang.Boolean => ZDtype.putLong(dt, buf, local, if (b) 1L else 0L)
      case b: java.lang.Byte => ZDtype.putLong(dt, buf, local, checkedLong(b.longValue()))
      case s: java.lang.Short => ZDtype.putLong(dt, buf, local, checkedLong(s.longValue()))
      case x: java.lang.Integer => ZDtype.putLong(dt, buf, local, checkedLong(x.longValue()))
      case l: java.lang.Long => ZDtype.putLong(dt, buf, local, checkedLong(l.longValue()))
      case f: java.lang.Float => ZDtype.put(dt, buf, local, checkedDouble(f.doubleValue()))
      case d0: java.lang.Double => ZDtype.put(dt, buf, local, checkedDouble(d0.doubleValue()))
      case t @ (_: java.sql.Timestamp | _: java.time.Instant) =>
        // M8[us] stores epoch micros raw
        ZDtype.putLong(dt, buf, local, micros(t))
      case other =>
        throw new IllegalArgumentException(s"zarr sink: unsupported value ${other.getClass}")
    }
  }

  /** External timestamp value → epoch micros (both java.sql and java.time
    * spellings, depending on spark.sql.datetime.java8API.enabled). */
  private[zarr] def micros(v: Any): Long = v match {
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
    case t: java.time.Instant => t.getEpochSecond * 1000000L + t.getNano / 1000L
    case other => throw new IllegalArgumentException(s"zarr sink: bad timestamp value $other")
  }

  def write(df: DataFrame, rawOptions: Map[String, String], overwrite: Boolean): Unit = {
    val opts = rawOptions.map { case (k, v) => k.toLowerCase -> v }
    def required(k: String): String =
      opts.getOrElse(k, throw new IllegalArgumentException(s"zarr sink requires option '$k'"))
    val path = required("path")
    val array = required("array")
    // `append.dim`: extend an EXISTING array along its leading dimension
    // (the streaming-foreachBatch pattern); a not-yet-existing array falls
    // through to the normal create path, so the first batch bootstraps
    if (opts.contains("append.dim") && !overwrite) {
      val probe = new ZarrStore(
        path,
        opts.collect { case (k, v) if k.startsWith("storage.") => k.drop("storage.".length) -> v },
        opts.get("group"),
        Some(false)
      )
      val exists = try probe.listArrays().contains(array)
      catch { case scala.util.control.NonFatal(_) => false }
      if (exists) {
        ZarrAppend.append(df, opts)
        return
      }
    }
    val group = opts.get("group")
    val storageOptions = opts.collect { case (k, v) if k.startsWith("storage.") => k.drop("storage.".length) -> v }
    val spark = df.sparkSession

    require(df.columns.contains("value"), "zarr sink requires a 'value' column")
    val dims = df.columns.filter(_ != "value").toVector
    require(dims.nonEmpty, "zarr sink requires at least one dimension column")
    val dtype = opts.getOrElse("dtype", dtypeFor(df.schema("value").dataType))
    val zdt = ZDtype.parse(dtype)
    val strValue = zdt.code == ZDtype.VSTR
    require(
      !strValue || df.schema("value").dataType == StringType,
      s"zarr sink: dtype '$dtype' needs a StringType value column"
    )
    if (zdt.code == ZDtype.V) df.schema("value").dataType match {
      case st: StructType =>
        require(
          st.fieldNames.toSeq == zdt.fields.map(_._1),
          s"zarr sink: struct value fields ${st.fieldNames.mkString(",")} do not match " +
            s"dtype fields ${zdt.fields.map(_._1).mkString(",")}"
        )
      case other =>
        throw new IllegalArgumentException(s"zarr sink: dtype '$dtype' needs a struct value column, got $other")
    }
    val v3 = opts.getOrElse("zarr_format", "2") match {
      case "2" => false
      case "3" => true
      case other => throw new IllegalArgumentException(s"zarr sink: bad zarr_format '$other' (2 or 3)")
    }
    if (v3) {
      require(
        zdt.code != ZDtype.M8,
        "zarr sink: zarr_format=3 has no core datetime64 data_type — write the epoch value as int64"
      )
      require(
        zdt.code != ZDtype.V,
        "zarr sink: zarr_format=3 has no structured data_type — write compound records as zarr_format=2"
      )
      // dims too, and BEFORE the distributed data job: writeCoordArrayV3
      // runs after all chunks are written, so a late failure would leave a
      // partially-written store after a fully wasted job
      dims.foreach { d =>
        require(
          !coordDtype(df.schema(d).dataType).contains("M8"),
          s"zarr sink: zarr_format=3 has no core datetime64 data_type for dimension '$d' — use an int64 epoch column"
        )
      }
    }
    val compressor = opts.get("compressor") match {
      case Some("none") | Some("null") => None
      case Some("zlib") if v3 => Some("gzip") // v3 has no zlib codec; gzip is its spelling
      case Some(c) => Some(c)
      case None => Some("blosc:lz4")
    }
    // v3 chunk encode chain (encode order), computed once driver-side
    val v3Cfgs: Seq[String] =
      if (!v3) Nil
      else compressor.toSeq.map(ZarrStoreWriterV3.codecCfg(_, math.max(zdt.itemSize, 1))) ++
        (if (opts.get("checksum").contains("true")) Seq("""{"name": "crc32c"}""") else Nil)
    // string values: sparse cells inside a WRITTEN chunk and absent chunks
    // both read back as the fill string (default "") — one consistent value
    val fillStr: String = if (strValue) opts.get("fill_value").getOrElse("") else ""
    // structured values: fill is a base64 packed cell (default all-zero
    // bytes — zarr-python's own default for compound dtypes)
    val structValue = zdt.code == ZDtype.V
    val structFill: Array[Byte] =
      if (!structValue) null
      else
        opts.get("fill_value") match {
          case None => new Array[Byte](zdt.itemSize)
          case Some(b64) =>
            val raw = java.util.Base64.getDecoder.decode(b64)
            require(
              raw.length == zdt.itemSize,
              s"zarr sink: structured fill_value decodes to ${raw.length} B, cell is ${zdt.itemSize} B"
            )
            raw
        }
    val fillValue =
      if (strValue || structValue) 0.0 else opts.get("fill_value").map(_.toDouble).getOrElse(0.0)
    // unsigned targets (explicit `dtype`=u1/u2/u4): validate range instead of
    // silently masking — a -1 written as 255 is the sink's worst failure mode
    val (rangeMin, rangeMax): (Long, Long) = zdt.code match {
      case ZDtype.U1 => (0L, 255L)
      case ZDtype.U2 => (0L, 65535L)
      case ZDtype.U4 => (0L, 4294967295L)
      case _ => (Long.MinValue, Long.MaxValue)
    }
    val rangeChecked = rangeMin != Long.MinValue
    if (rangeChecked)
      require(
        fillValue >= rangeMin && fillValue <= rangeMax,
        s"zarr sink: fill_value $fillValue out of range for unsigned dtype '$dtype' [$rangeMin, $rangeMax]"
      )

    val root = ZarrFileIO.toPath(path)
    val groupDir = group.map(g => new HPath(root, g)).getOrElse(root)
    val arrayDir = new HPath(groupDir, array)
    if (ZarrFileIO.exists(arrayDir, storageOptions)) {
      if (overwrite) ZarrFileIO.deleteRecursive(arrayDir, storageOptions)
      else
        throw new IllegalArgumentException(
          s"zarr array '$array' already exists at $groupDir — use mode('overwrite') to replace it " +
            "(partial in-place chunk updates are not supported)"
        )
    }

    // ---- coordinates: sorted distinct values per dim (small, driver-side
    // like the read path's coordFor); each becomes a broadcast (value ->
    // ordinal) frame so indexing stays inside codegen.
    //
    // ONE aggregation job gathers every dim's distinct set AND null count
    // (one input scan with map-side partial merge — not D `distinct()`
    // scans); a high-cardinality dim fails in the first map task that
    // exceeds the bound, before anything reaches the driver.
    val maxCoordValues = opts.get("max_coord_values").map(_.toInt).getOrElse(10000000)
    // long-axis coordinate arrays: cells per chunk object (read-path
    // deferral + chunk-stats pruning pick these up symmetrically)
    val coordChunkValues = opts.get("coord_chunk_values").map(_.toInt).getOrElse(1000000)
    require(coordChunkValues > 0, "zarr sink: coord_chunk_values must be positive")
    val aggCols = dims.flatMap { d =>
      coordDtype(df.schema(d).dataType) // validate early with a clear message
      Seq(
        GraftBridge.column(
          graft.functions
            .BoundedCollectSet(
              GraftBridge.expression(col(d)),
              maxCoordValues,
              failOnOverflow = false // overflow = "long axis": route below, don't fail
            )
            .toAggregateExpression()
        ),
        count(when(col(d).isNull, 1))
      )
    }
    val aggRow = df.agg(aggCols.head, aggCols.tail: _*).head()
    // Per-dim axis plan. Common case (Left): the bounded one-job gather
    // returned the axis driver-side — sort locally, broadcast the ordinal
    // map. Long axis (Right, cardinality past max_coord_values): the values
    // must NEVER sit on the driver or in a broadcast — distinct + total
    // sort + zipWithIndex assigns ordinals distributed, the ordinal join
    // becomes a shuffle join, and the coordinate array is written chunk-by-
    // chunk from executors. Same store either way.
    val axes: Vector[(String, DataType, Either[Array[Any], (org.apache.spark.rdd.RDD[(Any, Long)], Int)])] =
      dims.zipWithIndex.map { case (d, di) =>
        val dt = df.schema(d).dataType
        require(aggRow.getLong(2 * di + 1) == 0L, s"zarr sink: dimension '$d' contains NULL")
        if (!aggRow.isNullAt(2 * di)) {
          val vals = aggRow.getSeq[Any](2 * di).toArray.sorted(externalOrdering(dt))
          require(vals.nonEmpty, s"zarr sink: dimension '$d' has no values (empty input)")
          (d, dt, Left(vals))
        } else {
          val sorted = df
            .select(col(d))
            .distinct()
            .orderBy(col(d))
            .rdd
            .map(_.get(0))
            .zipWithIndex()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val n = sorted.count()
          require(
            n <= Int.MaxValue.toLong,
            s"zarr sink: dimension '$d' has $n distinct values — beyond the per-axis Int bound"
          )
          (d, dt, Right((sorted, n.toInt)))
        }
      }
    val shape = axes.map {
      case (_, _, Left(vals)) => vals.length
      case (_, _, Right((_, n))) => n
    }
    val chunks = opts.get("chunks") match {
      case Some(cs) =>
        val c = cs.split(",").map(_.trim.toInt).toVector
        require(c.length == shape.length && c.forall(_ > 0), s"bad chunks '$cs' for rank ${shape.length}")
        c
      case None => shape.map(s => math.min(s, 256))
    }
    val nChunksVec = shape.zip(chunks).map { case (s, c) => (s + c - 1) / c }
    val gridStrides = IndexMath.strides(nChunksVec)
    val chunkStrides = IndexMath.strides(chunks)
    // `shards` (v3 only): cells per SHARD OBJECT per dim — each a multiple
    // of `chunks`, which become the inner chunks of a sharding_indexed
    // store. At object-store scale this is the write shape that matters:
    // thousands of inner chunks per PUT instead of one object per chunk.
    val shardsOpt: Option[Vector[Int]] = opts.get("shards").map { ss =>
      require(v3, "zarr sink: 'shards' requires zarr_format=3 (sharding_indexed is a v3 codec)")
      val sv = ss.split(",").map(_.trim.toInt).toVector
      require(
        sv.length == shape.length && sv.zip(chunks).forall { case (s, c) => s > 0 && s % c == 0 },
        s"bad shards '$ss': must be per-dim positive multiples of chunks ${chunks.mkString(",")}"
      )
      require(
        sv.map(_.toLong).product * zdt.itemSize <= Int.MaxValue,
        s"shard of ${sv.map(_.toLong).product} cells x ${zdt.itemSize} B exceeds the 2 GB object bound — use smaller shards"
      )
      sv
    }

    var indexed = df
    axes.zipWithIndex.foreach { case ((d, dt, plan), di) =>
      val idxSchema = StructType(
        Seq(StructField("__v", dt, nullable = false), StructField(s"__i$di", LongType, nullable = false))
      )
      plan match {
        case Left(vals) =>
          import scala.jdk.CollectionConverters._
          val rows: java.util.List[Row] =
            vals.zipWithIndex.map { case (v, i) => Row(v, i.toLong) }.toList.asJava
          val idxDf = spark.createDataFrame(rows, idxSchema)
          indexed = indexed.join(broadcast(idxDf), indexed(d) === idxDf("__v")).drop("__v")
        case Right((sorted, _)) =>
          // long axis: the ordinal map stays distributed — shuffle join on
          // the dim value, never a broadcast near the 10M-row ceiling
          val idxDf = spark.createDataFrame(sorted.map { case (v, i) => Row(v, i) }, idxSchema)
          indexed = indexed.join(idxDf, indexed(d) === idxDf("__v")).drop("__v")
      }
    }
    // chunk ordinal + in-chunk offset as pure column arithmetic (`div` is
    // integral division — no double round-trip)
    val chunkExpr = dims.indices
      .map(di => expr(s"__i$di div ${chunks(di)}") * lit(gridStrides(di)))
      .reduce(_ + _)
    val localExpr = dims.indices
      .map(di => (col(s"__i$di") % lit(chunks(di))) * lit(chunkStrides(di)))
      .reduce(_ + _)
    val totalChunks = nChunksVec.map(_.toLong).product
    val shufflePartitions = spark.sessionState.conf.numShufflePartitions
    val chunkElems = chunks.map(_.toLong).product
    require(
      chunkElems * math.max(zdt.itemSize, 1) <= Int.MaxValue,
      s"chunk of ${chunkElems} elements x ${zdt.itemSize} B exceeds the 2 GB buffer bound — use smaller chunks"
    )

    val executorOpts = ZarrFileIO.executorOptions(storageOptions)
    val arrayDirStr = arrayDir.toString
    val comp = compressor
    val dt = zdt
    val fill = fillValue
    val elems = chunkElems.toInt
    val nChunksArr = nChunksVec.toArray
    val rMin = rangeMin
    val rMax = rangeMax
    val rCheck = rangeChecked
    val dtypeStr = dtype
    val isV3 = v3
    val v3CfgsSer = v3Cfgs
    val fillStrSer = fillStr
    val isStrValue = strValue
    val structFillSer = structFill
    // in-shape-only stats geometry: bounds must skip ragged-edge padding
    // cells or the stats-only min/max aggregate answers the fill value
    val geomSer = ChunkGeom(shape.map(_.toLong).toArray, chunks.toArray, nChunksVec.toArray)

    // ---- per-chunk value statistics (zone maps): on by default for
    // numeric/datetime dtypes on bounded grids; `chunk_stats=false` opts
    // out. Grids up to the flat cap (65536 chunks x ~40 B ≈ 3 MB attrs
    // doc + task-binary pruner) store per-chunk bounds in the attrs;
    // LARGER grids (up to flat_cap x block_len ≈ 2.7e8 chunks) switch to
    // the two-level layout — per-BLOCK rollups in the attrs, per-chunk
    // bounds in one side doc per block written by EXECUTORS (the driver
    // only ever collects <= flat_cap rollup records, never 1e6+ chunk
    // bounds). Sharded stores record bounds per INNER chunk — the scan's
    // pruning granularity — so a pruned inner chunk skips its byte-range
    // read inside the shard object. `stats.flat_cap` / `stats.block_len`
    // exist for spec-scale forcing of the hierarchical layout.
    val statsDomain: Option[String] =
      if (structValue) None else ZarrChunkStats.domainOf(zdt)
    val statsFlatCap: Long =
      opts.get("stats.flat_cap").map(_.toLong).getOrElse(ZarrChunkStats.FlatCap)
    val statsBlockLen: Long =
      opts.get("stats.block_len").map(_.toLong).getOrElse(ZarrChunkStats.DefaultBlockLen)
    require(statsFlatCap > 0 && statsBlockLen > 0, "stats.flat_cap / stats.block_len must be positive")
    val statsHier: Boolean = totalChunks > statsFlatCap
    val statsOn: Boolean =
      statsDomain.isDefined && totalChunks <= statsFlatCap * statsBlockLen &&
        opts.get("chunk_stats").forall(_.toBoolean)
    var statsAttrJson: Option[String] = None
    // grid past the two-level ceiling: stats are skipped — record WHY in
    // the attrs so the scan can warn instead of silently losing pruning
    val statsDroppedJson: Option[String] =
      if (statsDomain.isDefined && opts.get("chunk_stats").forall(_.toBoolean) &&
          totalChunks > statsFlatCap * statsBlockLen)
        Some(ZarrChunkStats.droppedJson(totalChunks, statsFlatCap * statsBlockLen, "ceiling"))
      else None
    def statsAttrMap: Map[String, String] =
      statsAttrJson.map(j => ZarrChunkStats.AttrKey -> j).toMap ++
        statsDroppedJson.map(j => ZarrChunkStats.DroppedAttrKey -> j).toMap

    def docOf(domain: String, rows: Iterable[ChunkBounds]): ZarrChunkStats.Doc = domain match {
      case "int" =>
        ZarrChunkStats.Doc(
          "int",
          totalChunks,
          boundsI = rows.map(r => r.ord -> (if (r.has) Some((r.loL, r.hiL)) else None)).toMap
        )
      case "float" =>
        ZarrChunkStats.Doc(
          "float",
          totalChunks,
          boundsF = rows.map(r => r.ord -> (if (r.has) Some((r.loD, r.hiD)) else None)).toMap
        )
      case _ =>
        ZarrChunkStats.Doc(
          "string",
          totalChunks,
          boundsS = rows.map(r => r.ord -> (if (r.has) Some((r.loS, r.hiS)) else None)).toMap
        )
    }

    /** Runs the write job carried by `rdd` and records its stats. Flat
      * grids collect the per-chunk bounds driver-side (bounded by the flat
      * cap); hierarchical grids shuffle the bounds by block (tiny — ~40 B
      * per WRITTEN chunk), write one side doc per block from executors,
      * and collect only the per-block rollups. */
    def finishStats(rdd: org.apache.spark.rdd.RDD[ChunkBounds]): Unit =
      if (!statsOn || !statsHier) {
        val rows = rdd.collect()
        if (statsOn) statsAttrJson = Some(ZarrChunkStats.toJson(docOf(statsDomain.get, rows)))
      } else {
        val domain = statsDomain.get
        val blockLen = statsBlockLen
        val dirStr = arrayDirStr
        val eOpts = executorOpts
        val totC = totalChunks
        val docOfSer = docOf _
        val nBlocks = (totC + blockLen - 1) / blockLen
        val rollParts = math.max(1L, math.min(shufflePartitions.toLong, nBlocks)).toInt
        val rollups: Array[(Long, Long, ChunkBounds)] = rdd
          .map(b => (b.ord / blockLen, b))
          .groupByKey(rollParts)
          .map { case (blk, bsIter) =>
            val bs = bsIter.toArray
            ZarrFileIO.writeString(
              new HPath(dirStr, s"${ZarrChunkStats.SideDir}/$blk"),
              eOpts,
              ZarrChunkStats.toJson(docOfSer(domain, bs))
            )
            val has = bs.filter(_.has)
            val roll: ChunkBounds =
              if (has.isEmpty) ChunkBounds(blk, has = false)
              else
                domain match {
                  case "int" =>
                    ChunkBounds(blk, has = true, loL = has.map(_.loL).min, hiL = has.map(_.hiL).max)
                  case "float" =>
                    ChunkBounds(
                      blk,
                      has = true,
                      loD = has.map(_.loD).min(Ordering.Double.TotalOrdering),
                      hiD = has.map(_.hiD).max(Ordering.Double.TotalOrdering)
                    )
                  case _ =>
                    ChunkBounds(
                      blk,
                      has = true,
                      loS = has.map(_.loS).reduce(ZarrChunkStats.byteLexMin),
                      hiS = has.map(_.hiS).reduce(ZarrChunkStats.byteLexMax)
                    )
                }
            (blk, bs.length.toLong, roll)
          }
          .collect()
        val rollDoc = docOf(domain, rollups.map(_._3)).copy(nChunks = nBlocks)
        statsAttrJson = Some(
          ZarrChunkStats.toJsonHier(
            ZarrChunkStats.Hier(
              domain,
              totC,
              blockLen,
              rollups.map(t => t._1 -> t._2).toMap,
              rollDoc
            )
          )
        )
      }

    shardsOpt match {
      case None if isStrValue =>
        // ---- string (vlen-utf8) chunks: one cells array at a time; unset
        // cells become the fill string so written-chunk and absent-chunk
        // reads agree. Stats: byte-lexicographic [min, max] per chunk.
        val prepared =
          indexed.select(chunkExpr.as("__chunk"), localExpr.as("__local"), col("value").as("__value"))
        val parts = math.max(1L, math.min(shufflePartitions.toLong, totalChunks)).toInt
        val statsOnSerStr = statsOn
        val strStatsRdd = prepared
          .repartition(parts, col("__chunk"))
          .sortWithinPartitions("__chunk")
          .rdd
          .mapPartitions { (rows: Iterator[Row]) =>
            var current = -1L
            var cells: Array[String] = null
            val stats = Array.newBuilder[ChunkBounds]
            def flush(): Unit = if (current >= 0L) {
              if (statsOnSerStr) stats += stringBoundsRecord(current, cells, geomSer)
              val raw = ZarrStoreWriter.vlenEncode(cells)
              val bytes =
                if (isV3) v3CfgsSer.foldLeft(raw)((b, cfg) => ZarrCodecV3.encode(cfg, b, 1))
                else ZarrCodec.compress(comp, raw, typesize = 1)
              val idx = new Array[Int](nChunksArr.length)
              var rem = current
              var d = nChunksArr.length - 1
              while (d >= 0) { idx(d) = (rem % nChunksArr(d)).toInt; rem /= nChunksArr(d); d -= 1 }
              val key =
                if (isV3) "c/" + idx.mkString("/") else ZarrChunkIO.chunkFileName(idx.toSeq)
              ZarrFileIO.writeBytes(new HPath(arrayDirStr, key), executorOpts, bytes)
            }
            while (rows.hasNext) {
              val r = rows.next()
              val c = r.getLong(0)
              if (c != current) {
                flush()
                current = c
                if (cells == null) cells = new Array[String](elems)
                java.util.Arrays.fill(cells.asInstanceOf[Array[AnyRef]], fillStrSer)
              }
              val v = r.getString(2)
              cells(r.getLong(1).toInt) = if (v == null) fillStrSer else v
            }
            flush()
            stats.result().iterator
          }
        finishStats(strStatsRdd)

      case None =>
        // ---- one task-streamed chunk buffer at a time; each chunk is one
        // on-store object. When stats are on (numeric dtype, bounded grid),
        // each task ALSO emits one [min, max] record per chunk it flushed —
        // rolled up via finishStats (driver-collected under the flat cap,
        // block side docs + rollups past it) and written into the array
        // attributes as chunk zone maps.
        val prepared =
          indexed.select(chunkExpr.as("__chunk"), localExpr.as("__local"), col("value").as("__value"))
        val parts = math.max(1L, math.min(shufflePartitions.toLong, totalChunks)).toInt
        val statsOnSer = statsOn
        val statsIntSer = statsDomain.contains("int")
        val statsRdd = prepared
          .repartition(parts, col("__chunk"))
          .sortWithinPartitions("__chunk")
          .rdd
          .mapPartitions { (rows: Iterator[Row]) =>
            val order = if (dt.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
            var current = -1L
            var buf: ByteBuffer = null
            val stats = Array.newBuilder[ChunkBounds]
            def flush(): Unit = if (current >= 0L) {
              if (statsOnSer) stats += chunkBoundsRecord(current, dt, buf, geomSer, statsIntSer)
              val bytes =
                if (isV3) v3CfgsSer.foldLeft(buf.array())((b, cfg) => ZarrCodecV3.encode(cfg, b, dt.itemSize))
                else ZarrCodec.compress(comp, buf.array(), typesize = dt.itemSize)
              // decompose the chunk ordinal over the chunk grid (C-order)
              val idx = new Array[Int](nChunksArr.length)
              var rem = current
              var d = nChunksArr.length - 1
              while (d >= 0) { idx(d) = (rem % nChunksArr(d)).toInt; rem /= nChunksArr(d); d -= 1 }
              val key =
                if (isV3) "c/" + idx.mkString("/") else ZarrChunkIO.chunkFileName(idx.toSeq)
              ZarrFileIO.writeBytes(new HPath(arrayDirStr, key), executorOpts, bytes)
            }
            while (rows.hasNext) {
              val r = rows.next()
              val c = r.getLong(0)
              if (c != current) {
                flush()
                current = c
                if (buf == null) buf = ByteBuffer.allocate(elems * dt.itemSize).order(order)
                // zero bytes already decode as 0/false in every supported dtype;
                // only a nonzero fill needs an explicit prefill pass
                if (structFillSer != null) {
                  var i = 0
                  while (i < elems) {
                    System.arraycopy(structFillSer, 0, buf.array(), i * dt.itemSize, dt.itemSize)
                    i += 1
                  }
                } else if (fill == 0.0) java.util.Arrays.fill(buf.array(), 0.toByte)
                else { var i = 0; while (i < elems) { ZDtype.put(dt, buf, i, fill); i += 1 } }
              }
              putCell(dt, buf, r.getLong(1).toInt, r.get(2), rCheck, rMin, rMax, dtypeStr)
            }
            flush()
            stats.result().iterator
          }
        finishStats(statsRdd)

      case Some(shards) =>
        // ---- sharded write: cluster rows by SHARD ordinal so each shard
        // object (inner chunks + crc32c'd byte-range index) is produced by
        // exactly one task in one streaming pass — one PUT per shard, the
        // object-store-friendly shape at scale. Memory: one inner-chunk
        // buffer + one shard's encoded bytes.
        val nShardsVec = shape.zip(shards).map { case (s, c) => (s + c - 1) / c }
        val shardStrides = IndexMath.strides(nShardsVec)
        val innerPerVec = shards.zip(chunks).map { case (s, c) => s / c }
        val shardExpr = dims.indices
          .map(di => expr(s"__i$di div ${shards(di)}") * lit(shardStrides(di)))
          .reduce(_ + _)
        val prepared = indexed.select(
          shardExpr.as("__shard"),
          chunkExpr.as("__chunk"),
          localExpr.as("__local"),
          col("value").as("__value")
        )
        val totalShards = nShardsVec.map(_.toLong).product
        val parts = math.max(1L, math.min(shufflePartitions.toLong, totalShards)).toInt
        val nShardsArr = nShardsVec.toArray
        val innerPerArr = innerPerVec.toArray
        val innerStrides = IndexMath.strides(innerPerVec).toArray
        val nInner = innerPerVec.map(_.toLong).product.toInt
        val statsOnSerSh = statsOn
        val statsIntSerSh = statsDomain.contains("int")
        val shardStatsRdd = prepared
          .repartition(parts, col("__shard"))
          .sortWithinPartitions("__shard", "__chunk")
          .rdd
          .mapPartitions { (rows: Iterator[Row]) =>
            val order = if (dt.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
            val rank = nShardsArr.length
            var curShard = -1L
            var curChunk = -1L
            var buf: ByteBuffer = null
            var cells: Array[String] = null // string values: vlen inner chunks
            val shardData = new java.io.ByteArrayOutputStream()
            val index = new Array[Long](nInner * 2)
            val stats = Array.newBuilder[ChunkBounds]
            def flushChunk(): Unit = if (curChunk >= 0L) {
              // bounds per INNER chunk — the scan's pruning granularity
              if (statsOnSerSh)
                stats += (if (isStrValue) stringBoundsRecord(curChunk, cells, geomSer)
                          else chunkBoundsRecord(curChunk, dt, buf, geomSer, statsIntSerSh))
              val raw =
                if (isStrValue) ZarrStoreWriter.vlenEncode(cells) else buf.array()
              val enc = v3CfgsSer.foldLeft(raw)((b, cfg) => ZarrCodecV3.encode(cfg, b, math.max(dt.itemSize, 1)))
              // within-shard inner ordinal from the GLOBAL chunk ordinal
              val cIdx = new Array[Int](rank)
              var rem = curChunk
              var d = rank - 1
              while (d >= 0) { cIdx(d) = (rem % nChunksArr(d)).toInt; rem /= nChunksArr(d); d -= 1 }
              var w = 0L
              var k = 0
              while (k < rank) { w += (cIdx(k) % innerPerArr(k)).toLong * innerStrides(k); k += 1 }
              index(2 * w.toInt) = shardData.size().toLong
              index(2 * w.toInt + 1) = enc.length.toLong
              shardData.write(enc)
            }
            def flushShard(): Unit = if (curShard >= 0L) {
              flushChunk()
              curChunk = -1L
              val ib = ByteBuffer.allocate(nInner * 16).order(ByteOrder.LITTLE_ENDIAN)
              var i = 0
              while (i < nInner * 2) { ib.putLong(i * 8, index(i)); i += 1 }
              val idxBytes = ZarrCodecV3.encode("""{"name": "crc32c"}""", ib.array(), math.max(dt.itemSize, 1))
              val sIdx = new Array[Int](rank)
              var rem = curShard
              var d = rank - 1
              while (d >= 0) { sIdx(d) = (rem % nShardsArr(d)).toInt; rem /= nShardsArr(d); d -= 1 }
              ZarrFileIO.writeBytes(
                new HPath(arrayDirStr, "c/" + sIdx.mkString("/")),
                executorOpts,
                shardData.toByteArray ++ idxBytes
              )
              shardData.reset()
            }
            while (rows.hasNext) {
              val r = rows.next()
              val s = r.getLong(0)
              val c = r.getLong(1)
              if (s != curShard) {
                flushShard()
                curShard = s
                java.util.Arrays.fill(index, -1L) // 2^64-1: missing inner chunk
              }
              if (c != curChunk) {
                flushChunk()
                curChunk = c
                if (isStrValue) {
                  if (cells == null) cells = new Array[String](elems)
                  java.util.Arrays.fill(cells.asInstanceOf[Array[AnyRef]], fillStrSer)
                } else {
                  if (buf == null) buf = ByteBuffer.allocate(elems * dt.itemSize).order(order)
                  if (fill == 0.0) java.util.Arrays.fill(buf.array(), 0.toByte)
                  else { var i = 0; while (i < elems) { ZDtype.put(dt, buf, i, fill); i += 1 } }
                }
              }
              if (isStrValue) {
                val v = r.getString(3)
                cells(r.getLong(2).toInt) = if (v == null) fillStrSer else v
              } else putCell(dt, buf, r.getLong(2).toInt, r.get(3), rCheck, rMin, rMax, dtypeStr)
            }
            flushShard()
            stats.result().iterator
          }
        finishStats(shardStatsRdd)
    }

    // ---- metadata (driver-side, after the data job): group marker, array
    // metadata, coordinate arrays, consolidated metadata
    if (v3) {
      val gj = new HPath(groupDir, "zarr.json")
      if (!ZarrFileIO.exists(gj, storageOptions))
        ZarrFileIO.writeString(gj, storageOptions, """{"zarr_format": 3, "node_type": "group"}""")
      val endianStr = if (zdt.bigEndian) "big" else "little"
      val statsAttrsJson: String =
        if (statsAttrMap.isEmpty) "{}"
        else statsAttrMap.map { case (k, j) => s""""$k": $j""" }.mkString("{", ", ", "}")
      val arrayDoc = shardsOpt match {
        case None if strValue =>
          // data_type "string": vlen-utf8 replaces the bytes codec
          val allCodecs = ("""{"name": "vlen-utf8"}""" +: v3Cfgs).mkString("[", ", ", "]")
          val dimNames = dims.map(x => s"""\"$x\"""").mkString("[", ", ", "]")
          s"""{"zarr_format": 3, "node_type": "array",
             |"shape": [${shape.mkString(",")}],
             |"data_type": "string",
             |"chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [${chunks.mkString(",")}]}},
             |"chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
             |"fill_value": ${ZarrStoreWriter.jsonStr(fillStr)},
             |"codecs": $allCodecs,
             |"attributes": $statsAttrsJson,
             |"dimension_names": $dimNames}""".stripMargin
        case None =>
          ZarrStoreWriterV3.arrayJson(
            shape, chunks, v3DataTypeName(dtype), v3Cfgs, Some(fillValue), Some(dims),
            separator = "/", endian = endianStr,
            attrs = statsAttrMap
          )
        case Some(shards) if strValue =>
          // sharded strings: vlen-utf8 inner chunks inside shard objects;
          // chunk_grid carries the SHARD shape, the sharding codec nests
          // the inner chunk shape + vlen chain
          val innerChain = ("""{"name": "vlen-utf8"}""" +: v3Cfgs).mkString("[", ", ", "]")
          val shardingCfg =
            s"""{"name": "sharding_indexed", "configuration": {
               |"chunk_shape": [${chunks.mkString(",")}],
               |"codecs": $innerChain,
               |"index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "crc32c"}],
               |"index_location": "end"}}""".stripMargin
          val dimNames = dims.map(x => s"""\"$x\"""").mkString("[", ", ", "]")
          s"""{"zarr_format": 3, "node_type": "array",
             |"shape": [${shape.mkString(",")}],
             |"data_type": "string",
             |"chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [${shards.mkString(",")}]}},
             |"chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
             |"fill_value": ${ZarrStoreWriter.jsonStr(fillStr)},
             |"codecs": [$shardingCfg],
             |"attributes": $statsAttrsJson,
             |"dimension_names": $dimNames}""".stripMargin
        case Some(shards) =>
          // chunk_grid carries the SHARD shape; the sharding codec nests the
          // inner chunk shape + codec chain
          val innerChain =
            (s"""{"name": "bytes", "configuration": {"endian": "$endianStr"}}""" +: v3Cfgs)
              .mkString("[", ", ", "]")
          val shardingCfg =
            s"""{"name": "sharding_indexed", "configuration": {
               |"chunk_shape": [${chunks.mkString(",")}],
               |"codecs": $innerChain,
               |"index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "crc32c"}],
               |"index_location": "end"}}""".stripMargin
          val withOuter = ZarrStoreWriterV3.arrayJson(
            shape, shards, v3DataTypeName(dtype), Nil, Some(fillValue), Some(dims),
            separator = "/", endian = endianStr,
            attrs = statsAttrMap
          )
          val doc = withOuter.replace(
            s""""codecs": [{"name": "bytes", "configuration": {"endian": "$endianStr"}}]""",
            s""""codecs": [$shardingCfg]"""
          )
          require(doc != withOuter, "sharded arrayJson rewrite failed")
          doc
      }
      ZarrFileIO.writeString(new HPath(arrayDir, "zarr.json"), storageOptions, arrayDoc)
      axes.foreach {
        case (d, cdt, Left(vals)) => writeCoordArrayV3(groupDir, d, vals, cdt, v3Cfgs, storageOptions)
        case (d, cdt, Right((sorted, n))) =>
          writeCoordArrayDistributed(
            groupDir, d, sorted, n, cdt, v3 = true, compressor, v3Cfgs, storageOptions, coordChunkValues
          )
      }
      consolidateV3(groupDir, storageOptions)
    } else {
      val zgroup = new HPath(groupDir, ".zgroup")
      if (!ZarrFileIO.exists(zgroup, storageOptions))
        ZarrFileIO.writeString(zgroup, storageOptions, """{"zarr_format": 2}""")
      ZarrFileIO.writeString(
        new HPath(arrayDir, ".zarray"),
        storageOptions,
        if (strValue)
          s"""{"zarr_format": 2, "shape": [${shape.mkString(",")}], "chunks": [${chunks.mkString(",")}],
             |"dtype": "|O", "order": "C", "compressor": ${ZarrStoreWriter.compressorJson(compressor)},
             |"fill_value": ${ZarrStoreWriter.jsonStr(fillStr)},
             |"filters": [{"id": "vlen-utf8"}]}""".stripMargin
        else if (structValue)
          // structured dtype is the raw JSON list; fill is the base64 cell
          s"""{"zarr_format": 2, "shape": [${shape.mkString(",")}], "chunks": [${chunks.mkString(",")}],
             |"dtype": $dtype, "order": "C", "compressor": ${ZarrStoreWriter.compressorJson(compressor)},
             |"fill_value": "${java.util.Base64.getEncoder.encodeToString(structFill)}",
             |"filters": null}""".stripMargin
        else ZarrStoreWriter.zarrayJson(shape, chunks, dtype, compressor, Some(fillValue))
      )
      ZarrFileIO.writeString(
        new HPath(arrayDir, ".zattrs"),
        storageOptions,
        ZarrStoreWriter.zattrsJson(
          Some(dims),
          statsAttrMap
        )
      )
      axes.foreach {
        case (d, cdt, Left(vals)) => writeCoordArray(groupDir, d, vals, cdt, compressor, storageOptions)
        case (d, cdt, Right((sorted, n))) =>
          writeCoordArrayDistributed(
            groupDir, d, sorted, n, cdt, v3 = false, compressor, Nil, storageOptions, coordChunkValues
          )
      }
      consolidate(groupDir, storageOptions)
    }
  }

  /** numpy dtype spelling → v3 core data_type name. */
  private def v3DataTypeName(dtype: String): String = {
    val kind = dtype.dropWhile(c => c == '<' || c == '>' || c == '|' || c == '=')
    kind match {
      case "b1" => "bool"
      case "i1" => "int8"; case "u1" => "uint8"
      case "i2" => "int16"; case "u2" => "uint16"
      case "i4" => "int32"; case "u4" => "uint32"
      case "i8" => "int64"
      case "f2" => "float16"; case "f4" => "float32"; case "f8" => "float64"
      case other =>
        throw new IllegalArgumentException(s"zarr sink: no v3 core data_type for dtype '$dtype' ($other)")
    }
  }

  /** One coordinate cell → buffer, exact for integral/timestamp types
    * (shared by the driver-side and distributed coordinate writers). */
  private[zarr] def putCoordCell(dt: ZDtype, buf: ByteBuffer, i: Int, v: Any): Unit = v match {
    case x: java.lang.Integer => ZDtype.putLong(dt, buf, i, x.longValue())
    case l: java.lang.Long => ZDtype.putLong(dt, buf, i, l.longValue())
    case f: java.lang.Float => ZDtype.put(dt, buf, i, f.doubleValue())
    case d: java.lang.Double => ZDtype.put(dt, buf, i, d.doubleValue())
    case t @ (_: java.sql.Timestamp | _: java.time.Instant) => ZDtype.putLong(dt, buf, i, micros(t))
    case s: String => ZDtype.putFixedString(dt, buf, i, s) // fixed |S / <U cells
    case bd: java.math.BigDecimal => ZDtype.putUnsigned64(dt, buf, i, bd) // uint64 axis
    case other => throw new IllegalArgumentException(s"zarr sink: bad coord value $other")
  }

  /** LONG-axis 1-D coordinate array: metadata driver-side, chunk objects
    * written FROM EXECUTORS out of the sorted (value, ordinal) RDD — the
    * axis values never materialize on the driver. 1M-cell chunks: a 10^9-
    * value axis is ~1000 objects, and the read path's deferred-coordinate
    * machinery (threshold, chunk cursors, stats pruning) picks it up
    * symmetrically. */
  private def writeCoordArrayDistributed(
      groupDir: HPath,
      dim: String,
      sorted: org.apache.spark.rdd.RDD[(Any, Long)],
      n: Int,
      sparkType: DataType,
      v3: Boolean,
      compressor: Option[String],
      v3Cfgs: Seq[String],
      storageOptions: Map[String, String],
      coordChunkValues: Int = 1000000
  ): Unit = {
    if (sparkType == StringType) {
      // LONG STRING axis: vlen-utf8 coordinate chunks written from
      // executors — the label-axis analog of the numeric path below. The
      // read side's deferred string machinery (threshold, chunk cursors,
      // lexicographic chunk-stats pruning) picks these up symmetrically;
      // Spark's StringType sort is binary UTF-8 order, matching the
      // UTF8String comparisons the pruner uses.
      writeStringCoordDistributed(
        groupDir, dim, sorted, n, v3, compressor, v3Cfgs, storageOptions, coordChunkValues
      )
      return
    }
    val dtype = coordDtype(sparkType)
    val dt = ZDtype.parse(dtype)
    val dir = new HPath(groupDir, dim)
    val chunkLen = math.min(n.toLong, coordChunkValues.toLong).toInt
    val nChunks = ((n.toLong + chunkLen - 1) / chunkLen).toInt
    if (v3) {
      require(
        !dtype.contains("M8"),
        s"zarr sink: zarr_format=3 has no core datetime64 data_type for dimension '$dim' — use an int64 epoch column"
      )
      ZarrFileIO.writeString(
        new HPath(dir, "zarr.json"),
        storageOptions,
        ZarrStoreWriterV3.arrayJson(
          Vector(n), Vector(chunkLen), v3DataTypeName(dtype), v3Cfgs, Some(0.0),
          Some(Vector(dim)), separator = "/", endian = "little"
        )
      )
    } else {
      ZarrFileIO.writeString(
        new HPath(dir, ".zarray"),
        storageOptions,
        ZarrStoreWriter.zarrayJson(Vector(n), Vector(chunkLen), dtype, compressor, Some(0.0))
      )
      ZarrFileIO.writeString(
        new HPath(dir, ".zattrs"),
        storageOptions,
        ZarrStoreWriter.zattrsJson(Some(Vector(dim)))
      )
    }
    val execOpts = ZarrFileIO.executorOptions(storageOptions)
    val dirStr = dir.toString
    val cl = chunkLen
    val isV3 = v3
    val comp = compressor
    val cfgs = v3Cfgs
    val dtSer = dt
    sorted
      .map { case (v, i) => (i / cl, (i % cl, v)) }
      .groupByKey(math.max(1, math.min(nChunks, sorted.sparkContext.defaultParallelism)))
      .foreach { case (c, cells) =>
        // full-size chunk, zero-padded past the axis end (zarr convention)
        val buf = ByteBuffer.allocate(cl * dtSer.itemSize).order(ByteOrder.LITTLE_ENDIAN)
        cells.foreach { case (off, v) => ZarrSink.putCoordCell(dtSer, buf, off.toInt, v) }
        val bytes =
          if (isV3) cfgs.foldLeft(buf.array())((b, cfg) => ZarrCodecV3.encode(cfg, b, dtSer.itemSize))
          else ZarrCodec.compress(comp, buf.array(), typesize = dtSer.itemSize)
        val key = if (isV3) s"c/$c" else c.toString
        ZarrFileIO.writeBytes(new HPath(dirStr, key), execOpts, bytes)
      }
    sorted.unpersist(blocking = false)
  }

  /** LONG-axis STRING (vlen-utf8) coordinate array: metadata driver-side,
    * chunk objects written FROM EXECUTORS out of the sorted (value,
    * ordinal) RDD. Each chunk is a full-size vlen frame, ""-padded past
    * the axis end (numcodecs VLenUTF8 convention, matching
    * [[ZarrStoreWriter.foreachStringChunk]]). */
  private def writeStringCoordDistributed(
      groupDir: HPath,
      dim: String,
      sorted: org.apache.spark.rdd.RDD[(Any, Long)],
      n: Int,
      v3: Boolean,
      compressor: Option[String],
      v3Cfgs: Seq[String],
      storageOptions: Map[String, String],
      coordChunkValues: Int
  ): Unit = {
    val dir = new HPath(groupDir, dim)
    val chunkLen = math.min(n.toLong, coordChunkValues.toLong).toInt
    val nChunks = ((n.toLong + chunkLen - 1) / chunkLen).toInt
    if (v3) {
      val allCodecs = ("""{"name": "vlen-utf8"}""" +: v3Cfgs).mkString("[", ", ", "]")
      ZarrFileIO.writeString(
        new HPath(dir, "zarr.json"),
        storageOptions,
        s"""{"zarr_format": 3, "node_type": "array",
           |"shape": [$n],
           |"data_type": "string",
           |"chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [$chunkLen]}},
           |"chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
           |"fill_value": null,
           |"codecs": $allCodecs,
           |"attributes": {},
           |"dimension_names": ["$dim"]}""".stripMargin
      )
    } else {
      ZarrFileIO.writeString(
        new HPath(dir, ".zarray"),
        storageOptions,
        s"""{"zarr_format": 2, "shape": [$n], "chunks": [$chunkLen],
           |"dtype": "|O", "order": "C", "compressor": ${ZarrStoreWriter.compressorJson(compressor)},
           |"fill_value": null, "filters": [{"id": "vlen-utf8"}]}""".stripMargin
      )
      ZarrFileIO.writeString(
        new HPath(dir, ".zattrs"),
        storageOptions,
        ZarrStoreWriter.zattrsJson(Some(Vector(dim)))
      )
    }
    val execOpts = ZarrFileIO.executorOptions(storageOptions)
    val dirStr = dir.toString
    val cl = chunkLen
    val isV3 = v3
    val comp = compressor
    val cfgs = v3Cfgs
    sorted
      .map { case (v, i) => (i / cl, (i % cl, v)) }
      .groupByKey(math.max(1, math.min(nChunks, sorted.sparkContext.defaultParallelism)))
      .foreach { case (c, cells) =>
        val arr = Array.fill(cl)("") // full-size chunk, ""-padded past the axis end
        cells.foreach { case (off, v) => arr(off.toInt) = v.asInstanceOf[String] }
        val raw = ZarrStoreWriter.vlenEncode(arr)
        val bytes =
          if (isV3) cfgs.foldLeft(raw)((b, cfg) => ZarrCodecV3.encode(cfg, b, 1))
          else ZarrCodec.compress(comp, raw, typesize = 1)
        val key = if (isV3) s"c/$c" else c.toString
        ZarrFileIO.writeBytes(new HPath(dirStr, key), execOpts, bytes)
      }
    sorted.unpersist(blocking = false)
  }

  /** Single-chunk 1-D v3 coordinate array written through the Hadoop FS. */
  private[zarr] def writeCoordArrayV3(
      groupDir: HPath,
      dim: String,
      vals: Array[Any],
      sparkType: DataType,
      cfgs: Seq[String],
      storageOptions: Map[String, String]
  ): Unit = {
    if (sparkType == StringType) {
      val dir = new HPath(groupDir, dim)
      val allCodecs = ("""{"name": "vlen-utf8"}""" +: cfgs).mkString("[", ", ", "]")
      ZarrFileIO.writeString(
        new HPath(dir, "zarr.json"),
        storageOptions,
        s"""{"zarr_format": 3, "node_type": "array",
           |"shape": [${vals.length}],
           |"data_type": "string",
           |"chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [${vals.length}]}},
           |"chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
           |"fill_value": null,
           |"codecs": $allCodecs,
           |"attributes": {},
           |"dimension_names": ["$dim"]}""".stripMargin
      )
      val raw = ZarrStoreWriter.vlenEncode(vals.map(_.asInstanceOf[String]))
      val bytes = cfgs.foldLeft(raw)((b, cfg) => ZarrCodecV3.encode(cfg, b, 1))
      ZarrFileIO.writeBytes(new HPath(new HPath(dir, "c"), "0"), storageOptions, bytes)
      return
    }
    val dtype = coordDtype(sparkType)
    require(
      !dtype.contains("M8"),
      s"zarr sink: zarr_format=3 has no core datetime64 data_type for dimension '$dim' — use an int64 epoch column"
    )
    val dt = ZDtype.parse(dtype)
    val dir = new HPath(groupDir, dim)
    val buf = ByteBuffer.allocate(vals.length * dt.itemSize).order(ByteOrder.LITTLE_ENDIAN)
    vals.zipWithIndex.foreach { case (v, i) =>
      v match {
        case x: java.lang.Integer => ZDtype.putLong(dt, buf, i, x.longValue())
        case l: java.lang.Long => ZDtype.putLong(dt, buf, i, l.longValue())
        case f: java.lang.Float => ZDtype.put(dt, buf, i, f.doubleValue())
        case d: java.lang.Double => ZDtype.put(dt, buf, i, d.doubleValue())
        case other => throw new IllegalArgumentException(s"zarr sink: bad coord value $other")
      }
    }
    ZarrFileIO.writeString(
      new HPath(dir, "zarr.json"),
      storageOptions,
      ZarrStoreWriterV3.arrayJson(
        Vector(vals.length), Vector(vals.length), v3DataTypeName(dtype), cfgs, Some(0.0),
        Some(Vector(dim)), separator = "/", endian = "little"
      )
    )
    val bytes = cfgs.foldLeft(buf.array())((b, cfg) => ZarrCodecV3.encode(cfg, b, dt.itemSize))
    ZarrFileIO.writeBytes(new HPath(dir, "c/0"), storageOptions, bytes)
  }

  /** Rebuild the root `zarr.json` consolidated metadata from the on-store
    * member documents — the FS-general sibling of
    * [[ZarrStoreWriterV3.consolidate]]. */
  private[zarr] def consolidateV3(groupDir: HPath, storageOptions: Map[String, String]): Unit = {
    val entries = ZarrFileIO.listDirNames(groupDir, storageOptions).sorted.flatMap { n =>
      ZarrFileIO
        .readStringIfExists(new HPath(new HPath(groupDir, n), "zarr.json"), storageOptions)
        .map(s => s""""$n": $s""")
    }
    ZarrFileIO.writeString(
      new HPath(groupDir, "zarr.json"),
      storageOptions,
      s"""{"zarr_format": 3, "node_type": "group",
         |"consolidated_metadata": {"kind": "inline", "must_understand": false,
         |"metadata": {${entries.mkString(",\n")}}}}""".stripMargin
    )
  }

  /** Single-chunk 1-D coordinate array written through the Hadoop FS. */
  private[zarr] def writeCoordArray(
      groupDir: HPath,
      dim: String,
      vals: Array[Any],
      sparkType: DataType,
      compressor: Option[String],
      storageOptions: Map[String, String]
  ): Unit = {
    if (sparkType == StringType) {
      // label axis: single-chunk vlen-utf8 object array
      val dir = new HPath(groupDir, dim)
      val raw = ZarrStoreWriter.vlenEncode(vals.map(_.asInstanceOf[String]))
      ZarrFileIO.writeString(
        new HPath(dir, ".zarray"),
        storageOptions,
        s"""{"zarr_format": 2, "shape": [${vals.length}], "chunks": [${vals.length}],
           |"dtype": "|O", "order": "C", "compressor": ${ZarrStoreWriter.compressorJson(compressor)},
           |"fill_value": null, "filters": [{"id": "vlen-utf8"}]}""".stripMargin
      )
      ZarrFileIO.writeString(new HPath(dir, ".zattrs"), storageOptions, ZarrStoreWriter.zattrsJson(Some(Vector(dim))))
      ZarrFileIO.writeBytes(
        new HPath(dir, "0"),
        storageOptions,
        ZarrCodec.compress(compressor, raw, typesize = 1)
      )
      return
    }
    val dtype = coordDtype(sparkType)
    val dt = ZDtype.parse(dtype)
    val dir = new HPath(groupDir, dim)
    val buf = ByteBuffer.allocate(vals.length * dt.itemSize).order(ByteOrder.LITTLE_ENDIAN)
    vals.zipWithIndex.foreach { case (v, i) =>
      v match {
        case x: java.lang.Integer => ZDtype.putLong(dt, buf, i, x.longValue())
        case l: java.lang.Long => ZDtype.putLong(dt, buf, i, l.longValue())
        case f: java.lang.Float => ZDtype.put(dt, buf, i, f.doubleValue())
        case d: java.lang.Double => ZDtype.put(dt, buf, i, d.doubleValue())
        case t @ (_: java.sql.Timestamp | _: java.time.Instant) => ZDtype.putLong(dt, buf, i, micros(t))
        case other => throw new IllegalArgumentException(s"zarr sink: bad coord value $other")
      }
    }
    ZarrFileIO.writeString(
      new HPath(dir, ".zarray"),
      storageOptions,
      ZarrStoreWriter.zarrayJson(Vector(vals.length), Vector(vals.length), dtype, compressor, Some(0.0))
    )
    ZarrFileIO.writeString(new HPath(dir, ".zattrs"), storageOptions, ZarrStoreWriter.zattrsJson(Some(Vector(dim))))
    ZarrFileIO.writeBytes(
      new HPath(dir, "0"),
      storageOptions,
      ZarrCodec.compress(compressor, buf.array(), typesize = dt.itemSize)
    )
  }

  /** Rebuild `.zmetadata` from the on-store metadata files — the FS-general
    * sibling of [[ZarrStoreWriter.consolidate]], covering pre-existing
    * arrays in the group as well as the ones just written. */
  private[zarr] def consolidate(groupDir: HPath, storageOptions: Map[String, String]): Unit = {
    val entries = scala.collection.mutable.ListBuffer[String]()
    ZarrFileIO.readStringIfExists(new HPath(groupDir, ".zgroup"), storageOptions).foreach { s =>
      entries += "\".zgroup\": " + s
    }
    ZarrFileIO.listDirNames(groupDir, storageOptions).sorted.foreach { n =>
      Seq(".zarray", ".zattrs").foreach { mf =>
        ZarrFileIO
          .readStringIfExists(new HPath(new HPath(groupDir, n), mf), storageOptions)
          .foreach(s => entries += s""""$n/$mf": $s""")
      }
    }
    ZarrFileIO.writeString(
      new HPath(groupDir, ".zmetadata"),
      storageOptions,
      s"""{"zarr_format": 2, "metadata": {${entries.mkString(",\n")}}}"""
    )
  }
}
